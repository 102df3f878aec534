"""GenAI layer tests (G1-G3 + M9).

F4 fixture rules (FIXTURES.md F4; Requirements/ExampleAiCode.md:156-248):
>= 6 full weeks, one stage absent in some week (stage omitted that week),
one week with zero rows (week omitted), integer-rounded stats, population
std. Provider dispatch is tested through an injected transport — request
SHAPE parity, no network.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from meshinsights_data_pipeline_spark.core.context import PipelineContext
from meshinsights_data_pipeline_spark.core.pipeline import Pipeline, PipelineConfig
from meshinsights_data_pipeline_spark.core.processor import Processor
from meshinsights_data_pipeline_spark.genai import (
    AiClassificationStep,
    any_high_variance,
    build_provider_request,
    stages_to_analyse,
    system_message,
    trigger_ai_issue_classification,
    weekly_summary,
)
from meshinsights_data_pipeline_spark.genai import classification as C

HVAC_VARIANCE = {
    "cooling_stage_1": {"variance": "High", "reason": "rcv"},
    "cooling_stage_2": {"variance": "Low", "reason": "default"},
    "heating_stage_1": {"variance": "Low", "reason": "default"},
    "heating_stage_2": {"variance": "Low", "reason": "default"},
    "fan_stage": {"variance": "Low", "reason": "default"},
}


def test_sibling_expansion_m9():
    got = stages_to_analyse(HVAC_VARIANCE)
    assert got == {"cooling_stage_1", "cooling_stage_2"}

    both_types = dict(HVAC_VARIANCE)
    both_types["heating_stage_2"] = {"variance": "High"}
    got = stages_to_analyse(both_types)
    assert got == {
        "cooling_stage_1",
        "cooling_stage_2",
        "heating_stage_1",
        "heating_stage_2",
    }

    assert stages_to_analyse({"fan_stage": {"variance": "Low"}}) == set()


@pytest.fixture(scope="module")
def weekly_fixture_df(spark):
    """7 calendar weeks of hourly data; week 3 (2024-01-21..27) has NO rows
    at all; cooling_stage_2 is absent in week 2 (2024-01-14..20)."""
    rows = []
    base = datetime(2024, 1, 7)  # a Sunday
    for week in range(7):
        if week == 3:
            continue  # empty week -> omitted from the dict
        for day in range(7):
            for hour in (9, 15):
                ts = base + timedelta(days=week * 7 + day, hours=hour)
                rows.append((ts, "cooling_stage_1", 2000.0 + week * 10 + hour))
                if week != 2:
                    rows.append((ts, "cooling_stage_2", 500.0 + day))
                rows.append((ts, "fan_stage", 100.0))  # not analysed
    return spark.createDataFrame(rows, ["timeStamp", "tstate", "energy"])


def test_weekly_summary_f4_shape(weekly_fixture_df):
    out = weekly_summary(weekly_fixture_df, HVAC_VARIANCE)

    # 6 non-empty weeks; the zero-row week (w3: 01-28..02-03) is omitted
    # (EAC:243-246)
    assert len(out) == 6
    assert "2024-01-28 - 2024-02-03" not in out
    assert "2024-02-04 - 2024-02-10" in out
    assert all(" - " in label for label in out)

    # stage with no datapoints that week (w2) is omitted (EAC:231-233)
    wk_absent = out["2024-01-21 - 2024-01-27"]
    assert "cooling_stage_2" not in wk_absent
    assert "cooling_stage_1" in wk_absent

    # non-analysed stage never appears
    assert all("fan_stage" not in stages for stages in out.values())

    # stats: ints, population std (ddof=0)
    import statistics

    first = out["2024-01-07 - 2024-01-13"]["cooling_stage_1"]
    vals = [2000.0 + 0 * 10 + h for _ in range(7) for h in (9, 15)]
    assert first["count"] == 14
    assert isinstance(first["mean"], int)
    assert first["mean"] == round(statistics.mean(vals))
    assert first["median"] == round(statistics.median(vals))
    assert first["std_dev"] == round(statistics.pstdev(vals))


def test_weekly_summary_empty_when_no_high(weekly_fixture_df):
    low_only = {s: {"variance": "Low"} for s in HVAC_VARIANCE}
    assert weekly_summary(weekly_fixture_df, low_only) == {}


def test_weekly_summary_stage_names_mapping(spark):
    """tstate codes mapped to display names (EAC:197-200 lookup)."""
    rows = [
        (datetime(2024, 1, 7) + timedelta(hours=h), code, 100.0 * code)
        for h in range(24)
        for code in (1, 2)
    ]
    df = spark.createDataFrame(rows, ["timeStamp", "tstate", "energy"])
    variance = {"cooling_stage_1": {"variance": "High"}}
    out = weekly_summary(
        df,
        variance,
        stage_names={1: "cooling_stage_1", 2: "cooling_stage_2"},
    )
    wk = out["2024-01-07 - 2024-01-13"]
    assert set(wk) == {"cooling_stage_1", "cooling_stage_2"}
    assert wk["cooling_stage_1"]["count"] == 24


def test_prompt_determinism():
    sys1 = system_message("2024-01-01", "2024-03-31")
    sys2 = system_message("2024-01-01", "2024-03-31")
    assert sys1 == sys2
    assert "Analysis period: 2024-01-01 - 2024-03-31" in sys1
    for tag in ("<task>", "<goals>", "<output_format>", "<data_context>"):
        assert tag in sys1


def test_provider_request_shapes():
    sysm, usr = "SYS", "USR"
    r = build_provider_request("openai", "gpt-5", sysm, usr)
    assert r["reasoning"] == {"effort": "medium"}
    assert r["input"][0] == {"role": "system", "content": "SYS"}

    r = build_provider_request("azure_openai", "gpt-4.1", sysm, usr)
    assert r["messages"][1] == {"role": "user", "content": "USR"}

    r = build_provider_request("anthropic", "claude-x", sysm, usr)
    assert r["max_tokens"] == 6000
    assert r["thinking"] == {"type": "enabled", "budget_tokens": 3000}
    assert r["system"] == "SYS"

    r = build_provider_request("google", "gemini-x", sysm, usr)
    assert r["contents"] == "SYS\n\nUSR"

    with pytest.raises(ValueError, match="Unknown model provider"):
        build_provider_request("cohere", "m", sysm, usr)


def test_transport_injection():
    seen = {}

    def stub(provider, model, request):
        seen.update(provider=provider, model=model, request=request)
        return "two concise paragraphs"

    out = trigger_ai_issue_classification(
        "S", "U", model_provider="anthropic", model_name="claude-x", transport=stub
    )
    assert out == "two concise paragraphs"
    assert seen["provider"] == "anthropic"
    assert seen["request"]["system"] == "S"


def test_ai_step_populates_context(weekly_fixture_df):
    ctx = PipelineContext(
        pipeline_name="p", correlation_id="c", raw_data=weekly_fixture_df
    )
    ctx.variance_analysis = dict(HVAC_VARIANCE)
    step = AiClassificationStep(start_date="2024-01-01", end_date="2024-03-01")
    out = step(ctx)
    ai = out.ai_analysis
    assert ai["stages_analysed"] == ["cooling_stage_1", "cooling_stage_2"]
    assert len(ai["weekly_summary"]) == 6
    assert "<power_variance_classification>" in ai["user_message"]
    assert "cooling_stage_1" in ai["user_message"]

    # explicit trigger stores the response
    resp = C.trigger(out, transport=lambda p, m, r: "diagnosis text")
    assert resp == "diagnosis text"
    assert out.ai_analysis["response"] == "diagnosis text"
    assert out.ai_analysis["model_provider"] == "azure_openai"


def test_trigger_requires_curation():
    ctx = PipelineContext(pipeline_name="p", correlation_id="c")
    with pytest.raises(ValueError, match="not populated"):
        C.trigger(ctx, transport=lambda p, m, r: "x")


def test_any_high_condition_gates_step(weekly_fixture_df):
    """The AI step is skipped when no stage is High (OPS:513-526)."""
    step = AiClassificationStep()
    pipe = Pipeline([step], conditions={"ai_classification": any_high_variance})

    ctx = PipelineContext(
        pipeline_name="p", correlation_id="c", raw_data=weekly_fixture_df
    )
    ctx.variance_analysis = {s: {"variance": "Low"} for s in HVAC_VARIANCE}
    out = pipe.run(ctx)
    assert out.ai_analysis == {}
    assert any(
        e["processor"] == "ai_classification" and e.get("skipped")
        for e in out.execution_log
    )

    ctx2 = PipelineContext(
        pipeline_name="p", correlation_id="c", raw_data=weekly_fixture_df
    )
    ctx2.variance_analysis = dict(HVAC_VARIANCE)
    out2 = pipe.run(ctx2)
    assert out2.ai_analysis["weekly_summary"]


# -- error-policy parity fixes (VERDICT What's-wrong #5/#6) -----------------


class _Boom(Processor):
    def process(self, context):
        raise RuntimeError("boom")


def test_pipeline_does_not_mutate_processor_policy():
    p = _Boom(name="boom", stop_on_error=True)
    pipe = Pipeline([p], config=PipelineConfig(stop_on_error=False))
    ctx = PipelineContext(pipeline_name="p", correlation_id="c")
    pipe.run(ctx)
    assert p.stop_on_error is True  # restored after the lenient run


def test_errors_recorded_on_fail_fast():
    """Reference src/core/processor.py:158-174: context.errors written on
    EVERY failure, warning only on continue."""
    p = _Boom(name="boom", stop_on_error=True)
    ctx = PipelineContext(pipeline_name="p", correlation_id="c")
    with pytest.raises(RuntimeError):
        p(ctx)
    assert any(e["processor"] == "boom" for e in ctx.errors)
    assert not ctx.warnings

    p2 = _Boom(name="boom2", stop_on_error=False)
    ctx2 = PipelineContext(pipeline_name="p", correlation_id="c")
    out = p2(ctx2)
    assert any(e["processor"] == "boom2" for e in out.errors)
    assert any("failed" in w["warning"] for w in out.warnings)
