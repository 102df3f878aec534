"""Multi-provider LLM dispatch (G3) behind an injectable transport.

Reference: Requirements/ExampleAiCode.md:387-495 — OpenAI (Responses API,
medium reasoning effort), Azure OpenAI (chat completions), Anthropic
(thinking budget), Google (single concatenated prompt). Each provider's
request SHAPE is reproduced as a plain dict so tests can assert parity
without SDKs or network; the actual SDK call happens only when a transport
(or the real SDK, gated behind import-try) is available.

The reference loads credentials from environment variables via dotenv; the
same env names are honored here (public, generic names from the reference).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# transport: (provider, model_name, request_dict) -> response text
Transport = Callable[[str, str, dict[str, Any]], str]

PROVIDERS = ("openai", "azure_openai", "anthropic", "google")


def build_provider_request(
    provider: str, model_name: str, system: str, user: str
) -> dict[str, Any]:
    """The provider-specific request payload (EAC:421-495 shapes)."""
    if provider == "openai":
        # Responses API with medium reasoning effort (EAC:425-438)
        return {
            "model": model_name,
            "reasoning": {"effort": "medium"},
            "input": [
                {"role": "system", "content": system},
                {"role": "user", "content": user},
            ],
        }
    if provider == "azure_openai":
        # Chat completions (EAC:455-461)
        return {
            "model": model_name,
            "messages": [
                {"role": "system", "content": system},
                {"role": "user", "content": user},
            ],
        }
    if provider == "anthropic":
        # Messages API with a thinking budget (EAC:469-480)
        return {
            "model": model_name,
            "max_tokens": 6000,
            "thinking": {"type": "enabled", "budget_tokens": 3000},
            "system": system,
            "messages": [{"role": "user", "content": user}],
        }
    if provider == "google":
        # Single concatenated prompt (EAC:488-493)
        return {"model": model_name, "contents": f"{system}\n\n{user}"}
    raise ValueError(f"Unknown model provider: {provider!r} (one of {PROVIDERS})")


def _sdk_transport(provider: str, model_name: str, request: dict[str, Any]) -> str:
    """Real SDK dispatch — used only when the provider SDK is importable and
    credentials are configured. Import-gated: the sandbox has no SDKs or
    network, so tests always inject a stub transport instead."""
    import os

    if provider == "openai":
        from openai import OpenAI  # noqa: PLC0415

        client = OpenAI(api_key=os.getenv("OPENAI_API_KEY"))
        response = client.responses.create(**request)
        return response.output_text
    if provider == "azure_openai":
        from openai import AzureOpenAI  # noqa: PLC0415

        client = AzureOpenAI(
            azure_endpoint=os.getenv("AZURE_OPENAI_ENDPOINT"),
            api_key=os.getenv("AZURE_OPENAI_API_KEY"),
            api_version=os.getenv("AZURE_OPENAI_API_VERSION", "2025-01-01-preview"),
        )
        response = client.chat.completions.create(**request)
        return response.choices[0].message.content
    if provider == "anthropic":
        from anthropic import Anthropic  # noqa: PLC0415

        client = Anthropic(api_key=os.getenv("ANTHROPIC_API_KEY"))
        response = client.messages.create(**request)
        # content[0] is the thinking block when thinking is enabled (EAC:482)
        return response.content[-1].text
    if provider == "google":
        from google import genai  # noqa: PLC0415

        client = genai.Client(api_key=os.getenv("GOOGLE_API_KEY"))
        response = client.models.generate_content(**request)
        return response.text
    raise ValueError(f"Unknown model provider: {provider!r}")


def trigger_ai_issue_classification(
    system: str,
    user: str,
    model_provider: str = "azure_openai",
    model_name: str = "gpt-4.1",
    transport: Transport | None = None,
) -> str:
    """EAC:387-417 — dispatch the assembled prompts to the chosen provider.

    ``transport`` injects the I/O (tests pass a deterministic stub); when
    omitted the import-gated SDK path is used.
    """
    request = build_provider_request(model_provider, model_name, system, user)
    if transport is not None:
        return transport(model_provider, model_name, request)
    return _sdk_transport(model_provider, model_name, request)
