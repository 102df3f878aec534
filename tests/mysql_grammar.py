"""Minimal MySQL 8.0 DML grammar checker for the generated JDBC sink SQL.

No MySQL server or parser library exists in this container, so the
dialect-string risk called out for the sink (`sources/factories.py`
upsert_sql/update_sql) is covered by a recursive-descent parser over the
exact statement classes the generator emits, transcribed from the public
MySQL 8.0 reference grammar:

  update:  UPDATE tbl SET col = %s [, col = %s]* WHERE col = %s
           [AND col = %s]*
  upsert:  INSERT INTO tbl (col [, col]*) VALUES (%s [, %s]*)
           ON DUPLICATE KEY UPDATE col = VALUES(col) [, col = VALUES(col)]*

Beyond syntax it enforces the semantic rules a server would reject at
parse/bind time: VALUES arity must equal the column-list arity, every
VALUES(col) on the update side must name an inserted column, and
unquoted identifiers must not be MySQL reserved words (a generator that
interpolates a reserved column name unquoted produces ER_PARSE_ERROR on
a real server even though it "looks" fine).

This intentionally REJECTS anything outside that grammar — e.g. the
sqlite/PostgreSQL `ON CONFLICT ... DO UPDATE` form, qmark placeholders,
trailing commas — so a dialect mix-up in the generator fails the test.
"""

from __future__ import annotations

import re

# Common MySQL 8.0 reserved words that plausibly appear as column names
# (full list in the MySQL reference manual, "Keywords and Reserved Words").
# Unquoted use of any of these is a server-side parse error.
MYSQL_RESERVED = {
    "add", "all", "alter", "and", "as", "asc", "between", "by", "case",
    "check", "column", "condition", "create", "cross", "current_date",
    "current_time", "current_timestamp", "database", "default", "delete",
    "desc", "describe", "distinct", "div", "drop", "else", "exists",
    "false", "from", "generated", "group", "having", "ignore", "in",
    "index", "inner", "insert", "interval", "into", "is", "join", "key",
    "keys", "left", "like", "limit", "lock", "long", "match", "not",
    "null", "on", "or", "order", "outer", "partition", "primary", "range",
    "rank", "read", "references", "replace", "right", "row", "rows",
    "select", "set", "show", "system", "table", "then", "to", "true",
    "union", "unique", "update", "usage", "use", "using", "values",
    "when", "where", "window", "with",
}

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<ph>%s)"                       # pyformat placeholder
    r"|(?P<qident>`(?:[^`]|``)+`)"      # backtick-quoted identifier
    r"|(?P<word>[A-Za-z_][A-Za-z0-9_$]*)"
    r"|(?P<punct>[(),.=])"
    r")"
)


class MySQLSyntaxError(ValueError):
    pass


def _tokenize(sql: str) -> list[str]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m or m.end() == m.start():
            rest = sql[pos:].strip()
            if not rest:
                break
            raise MySQLSyntaxError(f"unrecognized token at: {rest[:25]!r}")
        out.append(m.group(m.lastgroup))
        pos = m.end()
    if sql[pos:].strip():
        raise MySQLSyntaxError(f"trailing garbage: {sql[pos:]!r}")
    return out


class _Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise MySQLSyntaxError("unexpected end of statement")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_kw(self, *kws: str) -> None:
        for kw in kws:
            t = self.next()
            if t.lower() != kw.lower():
                raise MySQLSyntaxError(f"expected {kw!r}, got {t!r}")

    def expect_punct(self, p: str) -> None:
        t = self.next()
        if t != p:
            raise MySQLSyntaxError(f"expected {p!r}, got {t!r}")

    def identifier(self) -> str:
        """One (possibly qualified, possibly quoted) identifier."""
        t = self.next()
        name = self._one_ident(t)
        while self.peek() == ".":  # schema.table / table.column
            self.next()
            name += "." + self._one_ident(self.next())
        return name

    def _one_ident(self, t: str) -> str:
        if t.startswith("`") and t.endswith("`") and len(t) > 2:
            return t[1:-1].replace("``", "`")
        if not re.fullmatch(r"[A-Za-z_$][A-Za-z0-9_$]*", t):
            raise MySQLSyntaxError(f"bad identifier: {t!r}")
        if t.lower() in MYSQL_RESERVED:
            raise MySQLSyntaxError(
                f"reserved word {t!r} used as unquoted identifier"
            )
        return t

    def placeholder(self) -> None:
        t = self.next()
        if t != "%s":
            raise MySQLSyntaxError(f"expected pyformat placeholder, got {t!r}")

    def done(self) -> None:
        if self.i != len(self.toks):
            raise MySQLSyntaxError(
                f"unexpected trailing tokens: {self.toks[self.i:]!r}"
            )


def validate_mysql_update(sql: str) -> None:
    """UPDATE tbl SET c = %s [, c = %s]* WHERE c = %s [AND c = %s]*"""
    p = _Parser(sql)
    p.expect_kw("UPDATE")
    p.identifier()
    p.expect_kw("SET")
    while True:
        p.identifier()
        p.expect_punct("=")
        p.placeholder()
        if p.peek() == ",":
            p.next()
            continue
        break
    p.expect_kw("WHERE")
    while True:
        p.identifier()
        p.expect_punct("=")
        p.placeholder()
        if (p.peek() or "").lower() == "and":
            p.next()
            continue
        break
    p.done()


def validate_mysql_upsert(sql: str) -> None:
    """INSERT INTO tbl (cols) VALUES (%s...) ON DUPLICATE KEY UPDATE
    c = VALUES(c), ... — with arity and column-membership checks."""
    p = _Parser(sql)
    p.expect_kw("INSERT", "INTO")
    p.identifier()
    p.expect_punct("(")
    cols = [p.identifier()]
    while p.peek() == ",":
        p.next()
        cols.append(p.identifier())
    p.expect_punct(")")
    p.expect_kw("VALUES")
    p.expect_punct("(")
    n_ph = 0
    while True:
        p.placeholder()
        n_ph += 1
        if p.peek() == ",":
            p.next()
            continue
        break
    p.expect_punct(")")
    if n_ph != len(cols):
        raise MySQLSyntaxError(
            f"VALUES arity {n_ph} != column-list arity {len(cols)}"
        )
    p.expect_kw("ON", "DUPLICATE", "KEY", "UPDATE")
    inserted = {c.lower() for c in cols}
    while True:
        target = p.identifier()
        p.expect_punct("=")
        p.expect_kw("VALUES")
        p.expect_punct("(")
        source = p.identifier()
        p.expect_punct(")")
        for name in (target, source):
            if name.lower() not in inserted:
                raise MySQLSyntaxError(
                    f"ON DUPLICATE KEY UPDATE references {name!r}, "
                    "which is not an inserted column"
                )
        if p.peek() == ",":
            p.next()
            continue
        break
    p.done()
