"""Prompt assembly (G2) — deterministic, driver-side string templating.

Reference: Requirements/ExampleAiCode.md:56-152 (system message),
:250-383 (user message snippets + composition). The templates reproduce the
reference's structure and section tags verbatim so a reference user's
downstream prompt-parsing keeps working; the analysis-period dates are
interpolated exactly as in EAC:125.
"""

from __future__ import annotations

from typing import Any

SYSTEM_MESSAGE_TEMPLATE = """
<task>
- Analyze the provided data and classify potential issues with the HVAC unit.
- Your audience understands HVAC systems and data analytics, but they appreciate simple language and concise explanations.
- Primarily focus on the stage(s) that exhibit "High" power variance over the analysis period.
- Don't ignore the other stages, see if the behavior of the other stages hint at issues that help to classify the issue(s) in the stage(s) that exhibit "High" power variance.
</task>

<goals>
1. Determine issue(s) causing the "High" power variance in the stage(s).
2. Any major issues present in the other stages that may not have been identified in the upstream analysis?
3. Provide enough detail to help the user resolve the issue(s) identified. (i.e. stages experiencing issues, when and how the issue is occurring, etc.)
</goals>

<output_format>
2 concise paragraphs (~2 sentences each) that summarize:
1. The issue(s) identified and what trends in the data lead to your conclusion.
2. What additional data and/or investigation would you recommend an expert to analyze/perform to validate your findings.
</output_format>

<output_content>
Don't include:
- Reference to the specific algorithms used (i.e. "Gaussian Mixture model revealed...")
- Overly technical and verbose language (i.e. "...conduct temporal analysis with finer resolution...")

Include:
- Concise examples of trends in the data to provide a simple explanation of the issue(s) identified.
- Drastic changes in power consumption over time (i.e. "In Feb-April the median power consumption in cooling phase 1 was ~2,500W, then in May it dropped to ~170W.)
- Key date ranges where changes occured and where to focus subsequent analysis.
</output_content>

<use_case_context>
- This is a commercial HVAC unit monitored by an energy-management solution.
- This unit's data was routed to you because at least one of the stages exhibited "High" power variance over the analysis period without an obvious root cause based on a simplistic rules-based approach.
- What is "High" power variance as opposed to "Low" power variance:
    > Low Variance: The vast majority of power consumption is within a relatively narrow range (not in absolute numbers given that power can range from ~200-13,000W) and often follows a normal distribution or skewed distribution (there's a clear clustering of power values).
    > High Variance: Power consumption varies widely and there is no clear primary clustering of power values.
</use_case_context>

<make_sure_to_consider_the_following_when_classifying_issues>
- Is there a time based trend in the power consumption?
    > Is the average power consumption increasing or decreasing drastically over time?
    > Is the variance increasing or decreasing drastically over time?
- Are there any patterns that are present across multiple stages?
- Is the machine idling during a heating or cooling cycle as shown by a very low power consumption over many cycles relative to previous cycles?
- Is the machine short cycling as shown by rapid changes in power consumption over a given cycle?
</make_sure_to_consider_the_following_when_classifying_issues>


<data_context>
- Analysis period: {start_date} - {end_date}
- Data resolution: hourly measurements
- Raw datapoints: timestamp [datetime], power [watts], stage [str], cycle [int]...
- Stages in the dataset: cooling stage 1, cooling stage 2, heating stage 1, heating stage 2, and fan stage.
    > All data from other stages such as "Fan Only" and "Idle" are deleted.
    > Trust that the data and the stages are correct.
- Cycle is an index that keeps track of distinct cycles which are identified as successive measures where the stage is constant.
</data_context>
"""

VARIANCE_DOCSTRING = '''
Determines if power variance for an HVAC stage is "Low" or "High".

Methodology
-----------
1.  **Robust Dispersion Check (Safety Net)**:
    A fast, outlier-resistant check using the "Robust Coefficient of
    Variation" (rCV = Median Absolute Deviation / Median) catches stages
    with broadly and persistently spread-out power readings; immune to
    spurious short-lived sensor spikes.

2.  **Multi-Modal Analysis (GMM)**:
    A Gaussian Mixture Model is fit with 1..MAX_COMPONENTS components and
    the Bayesian Information Criterion picks the optimal count. A stage is
    "High" variance only if at least two modes are both statistically
    significant (weight >= MIN_SIGNIFICANT_WEIGHT) and meaningfully
    separated (mean separation >= SEPARATION_THRESHOLD x overall median).

Tuning Parameters
-----------------
- RCV_THRESHOLD (Default: 0.35): rCV above this -> "High" immediately.
- MIN_SAMPLES_FOR_TEST (Default: 50): fewer samples -> default "Low".
- MAX_COMPONENTS (Default: 3): GMM complexity cap.
- MIN_SIGNIFICANT_WEIGHT (Default: 0.10): noise filter for components.
- SEPARATION_THRESHOLD (Default: 0.20): practical-difference filter.

Returns
-------
Dict mapping each stage to {variance, reason, n_components, means, weights,
covariances}.
'''


def system_message(start_date: Any, end_date: Any) -> str:
    """EAC:56-133 — the system prompt with the analysis period interpolated."""
    return SYSTEM_MESSAGE_TEMPLATE.format(start_date=start_date, end_date=end_date)


def user_message_power_over_time(weekly: dict[str, dict[str, dict[str, int]]]) -> str:
    """EAC:250-271 — weekly power-consumption snippet around the F4 dict."""
    return f"""
<power_consumption_calculations_over_time>

<power_consumption_calculations_over_time_context>
- Calculates the count, mean, median, and standard deviation of power consumption measurements over the analysis period for each "relevant" stage on a weekly basis.
- "relevant" stages are those that exhibit "High" power variance over the analysis period and any higher/lower stages of the same type.
    > heating | cooling | fan stages are the broad distinct types.
    > ex: if cooling stage 1 is "High" variance then cooling stage 2 is also included in the calculations.
- Data format: dictionary with keys as week labels and values as dictionaries with keys as stage names and values as dictionaries with keys as count, mean, median, and standard deviation.
</power_consumption_calculations_over_time_context>

<power_consumption_calculations_over_time_data>
{weekly}
</power_consumption_calculations_over_time_data>

</power_consumption_calculations_over_time>
"""


def user_message_power_variance(power_variance: dict[str, dict[str, Any]]) -> str:
    """EAC:275-383 — variance-classification snippet with the algorithm
    docstring as context."""
    return f"""
<power_variance>
<power_variance_context>
- Power variance was calculated in a previous phase of the pipeline using the same data and time period.
- The only options for power variance are "Low" or "High".
- The detailed docstrings for the python code that calculated the power variance are provided below:
'''{VARIANCE_DOCSTRING}'''
</power_variance_context>


<power_variance_classification>
{power_variance}
</power_variance_classification>

</power_variance>
"""


def full_user_message(
    power_variance: dict[str, dict[str, Any]],
    weekly: dict[str, dict[str, dict[str, int]]],
) -> str:
    """EAC:137-152 — variance snippet first, then power-over-time."""
    return f"""
{user_message_power_variance(power_variance)}

{user_message_power_over_time(weekly)}
"""
