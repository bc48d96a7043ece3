"""Conversation / instruction-tuning data preparation.

Chat corpora arrive as arrays of (role, content) turns; trainers
consume a single rendered string per conversation in a fixed template.
Rendering is a pure Column transformation (HOF transform + array_join
— JVM-side, no UDF), so templating 100 TB of conversations is map-only
and the same expressions drive batch and Structured Streaming.

Templates:

* ``chatml``  — ``<|im_start|>role\\ncontent<|im_end|>\\n`` per turn,
  optionally followed by a generation prompt header.
* ``plain``   — ``role: content`` lines (debug/readability).

Validation (:func:`chat_stats`) computes the structural signals
instruction-data pipelines filter on: turn counts, role alternation,
empty turns, leading-system flag, and total content length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_TEMPLATES = ("chatml", "plain")


def render_chat(
    turns: Column,
    template: str = "chatml",
    add_generation_prompt: bool = False,
    assistant_role: str = "assistant",
) -> Column:
    """Render an ``array<struct<role:string, content:string>>`` column
    into one training string. ``add_generation_prompt`` appends the
    empty assistant header (inference-prompt form). Map-only."""
    if template not in _TEMPLATES:
        raise ValueError(
            f"render_chat: template must be one of {_TEMPLATES}, got {template!r}"
        )
    if template == "chatml":
        rendered = F.array_join(
            F.transform(
                turns,
                lambda t: F.concat(
                    F.lit("<|im_start|>"),
                    t["role"],
                    F.lit("\n"),
                    t["content"],
                    F.lit("<|im_end|>\n"),
                ),
            ),
            "",
        )
        if add_generation_prompt:
            rendered = F.concat(
                rendered, F.lit(f"<|im_start|>{assistant_role}\n")
            )
        return rendered
    rendered = F.array_join(
        F.transform(
            turns, lambda t: F.concat(t["role"], F.lit(": "), t["content"])
        ),
        "\n",
    )
    if add_generation_prompt:
        rendered = F.concat(rendered, F.lit(f"\n{assistant_role}:"))
    return rendered


def chat_stats(turns: Column) -> Column:
    """Structural quality signals for a conversation column — the
    filters an instruction-data pipeline applies before rendering:
    struct(n_turns, n_user, n_assistant, has_system_first,
    n_empty_turns, alternates (user/assistant strictly alternate after
    any leading system), total_chars). Pure Column logic."""
    roles = F.transform(turns, lambda t: t["role"])
    body = F.filter(roles, lambda r: r != "system")
    alternates = F.forall(
        F.zip_with(
            body,
            F.slice(
                body, 2, F.greatest(F.size(body) - 1, F.lit(0))
            ),
        # zip_with pads the shorter side with NULL; the pad rows pass
            lambda a, b: b.isNull() | (a != b),
        ),
        lambda ok: ok,
    )
    return F.struct(
        F.size(turns).alias("n_turns"),
        F.size(F.filter(roles, lambda r: r == "user")).alias("n_user"),
        F.size(F.filter(roles, lambda r: r == "assistant")).alias(
            "n_assistant"
        ),
        (F.element_at(roles, 1) == "system").alias("has_system_first"),
        F.size(
            F.filter(turns, lambda t: F.length(F.trim(t["content"])) == 0)
        ).alias("n_empty_turns"),
        alternates.alias("alternates"),
        F.aggregate(
            turns,
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + F.length(t["content"]),
        ).alias("total_chars"),
    )
