"""Conversation (SFT/chat) data preparation.

Pretraining eats documents; instruction tuning eats CONVERSATIONS —
arrays of (role, content) turns — and the prep pipeline needs the same
hygiene the document tier gets, at the turn grain: structural
validation, per-turn dedup keys, a deterministic rendering to the flat
text the trainer tokenizes, and loss-mask boundaries (train on
assistant turns only — the standard SFT recipe).

The conversation column is ``array<struct<role:string,content:string>>``
— the storage shape chat datasets publish (role ∈ system/user/
assistant by convention; validation is data-driven, not hardcoded).

Reference scope note: training-data-pipeline surface per the build
brief (SURVEY.md §7.1.5); no conversation layer exists in the
reference.

Scale: every function here is row-local (map-only Column expressions —
turn arrays are bounded by dialog length); only `explode_turns`
produces rows for cross-turn operators, and those rows are narrow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ChatML-ish rendering (public convention): <|role|>\ncontent<|end|>\n
_TEMPLATES = {
    "chatml": ("<|{role}|>\n", "<|end|>\n"),
    "plain": ("{role}: ", "\n"),
}


def explode_turns(df: DataFrame, *, id_col: str, conv_col: str) -> DataFrame:
    """(id, turn_idx, role, content) rows — the grain for turn-level
    dedup/PII/quality via the existing document-tier operators."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(conv_col)).alias("turn_idx", "__t"),
    ).select(
        id_col,
        "turn_idx",
        F.col("__t.role").alias("role"),
        F.col("__t.content").alias("content"),
    )


def validate_conversations(
    df: DataFrame,
    *,
    conv_col: str,
    roles: tuple[str, ...] = ("system", "user", "assistant"),
    require_alternation: bool = True,
    require_assistant: bool = True,
) -> DataFrame:
    """Append ``conv_valid`` (boolean) + ``conv_invalid_reason``
    (string, NULL when valid): non-empty, every role non-null and in
    `roles`, no null/empty content, any system turn only in the leading
    position, optionally user/assistant strictly alternating after the
    optional leading system turn, optionally at least one assistant
    turn (a dialog with nothing to train on is dead weight).
    Filter on the flag or route invalid rows to a quarantine sink —
    the JSONL ingest contract (`sources/files.read_jsonl_quarantined`),
    applied at the structure level.
    """
    conv = F.col(conv_col)
    # NULL-first: F.size(NULL) is NULL, and a NULL `empty` would fall
    # through EVERY branch below when the alternation/assistant knobs
    # are off, landing the NULL conversation in the valid otherwise-arm
    # (r8 ADVICE) — so the leading check names NULL and empty explicitly
    empty = conv.isNull() | (F.size(conv) == 0)
    # NULL role must read as bad, not as three-valued unknown: a bare
    # ~isin(...) is NULL for a NULL role, exists() propagates the NULL,
    # and F.when treats it as false — the malformed turn would validate
    bad_role = F.exists(
        conv, lambda t: t["role"].isNull() | ~t["role"].isin(*roles)
    )
    bad_content = F.exists(
        conv, lambda t: t["content"].isNull() | (F.trim(t["content"]) == "")
    )
    # at most ONE system turn, and only in the leading position — a
    # system prompt rendered mid- or post-conversation is a position no
    # chat template allows, so it must not validate
    first_is_system = F.coalesce(
        F.try_element_at(conv, F.lit(1))["role"] == "system", F.lit(False)
    )
    body = F.when(
        first_is_system, F.slice(conv, 2, F.greatest(F.size(conv) - 1, F.lit(0)))
    ).otherwise(conv)
    stray_system = F.exists(body, lambda t: t["role"] == "system")
    # strict user/assistant alternation: turn i's role differs from
    # turn i+1's, and the body starts with 'user'
    pairs_ok = F.aggregate(
        F.zip_with(
            F.slice(body, 1, F.greatest(F.size(body) - 1, F.lit(0))),
            F.slice(body, 2, F.greatest(F.size(body) - 1, F.lit(0))),
            lambda a, b: a["role"] != b["role"],
        ),
        F.lit(True),
        lambda acc, x: acc & x,
    )
    starts_user = F.coalesce(
        F.try_element_at(body, F.lit(1))["role"] == "user", F.lit(False)
    )
    no_assistant = ~F.exists(conv, lambda t: t["role"] == "assistant")

    reason = F.when(empty, "empty")
    reason = reason.when(bad_role, "unknown_role")
    reason = reason.when(bad_content, "empty_content")
    reason = reason.when(stray_system, "system_not_leading")
    if require_alternation:
        reason = reason.when(~starts_user, "body_must_start_with_user")
        reason = reason.when(~pairs_ok, "non_alternating_roles")
    if require_assistant:
        reason = reason.when(no_assistant, "no_assistant_turn")
    reason = reason.otherwise(F.lit(None).cast("string"))
    return df.withColumn("conv_invalid_reason", reason).withColumn(
        "conv_valid", F.col("conv_invalid_reason").isNull()
    )


def _render_turn(t: Column, template: str) -> Column:
    head, tail = _TEMPLATES[template]
    pre, post = head.split("{role}")
    return F.concat(
        F.lit(pre), t["role"], F.lit(post), t["content"], F.lit(tail)
    )


def render_conversation(
    df: DataFrame,
    *,
    conv_col: str,
    template: str = "chatml",
    out_col: str = "text",
) -> DataFrame:
    """Flatten each conversation to the single training string the
    tokenizer sees (`template`: "chatml" — ``<|role|>\\ncontent<|end|>``
    — or "plain" — ``role: content``). Deterministic, row-local; the
    flat text drops into every document-tier operator (dedup shingles,
    decontam 5-grams, token counting) unchanged.

    A conversation containing any NULL-role/NULL-content turn renders
    as NULL text (not a silently-shortened string): ``array_join``
    would DROP the NULL rendered turn while `loss_mask_spans`' running
    lengths go NULL from that turn onward — the two would disagree on
    every later offset (r8 ADVICE). Such rows are
    `validate_conversations` rejects anyway; the NULL keeps the
    invariant even for callers that skip validation.
    """
    if template not in _TEMPLATES:
        raise ValueError(
            f"template must be one of {sorted(_TEMPLATES)}; got {template!r}"
        )
    conv = F.col(conv_col)
    any_null_turn = ~F.forall(
        conv, lambda t: t["role"].isNotNull() & t["content"].isNotNull()
    )
    rendered = F.array_join(
        F.transform(conv, lambda t: _render_turn(t, template)), ""
    )
    return df.withColumn(
        out_col,
        F.when(conv.isNull() | any_null_turn, F.lit(None).cast("string"))
        .otherwise(rendered),
    )


def loss_mask_spans(
    df: DataFrame,
    *,
    id_col: str,
    conv_col: str,
    template: str = "chatml",
    train_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """CHARACTER spans of `render_conversation`'s output to train on —
    one row per trainable turn: (id, turn_idx, start, end) half-open
    offsets into the rendered string, covering exactly the turn's
    rendered block (header + content + terminator). The trainer maps
    char spans to token masks after tokenization (offset mapping), the
    standard decoupling — masks computed here stay tokenizer-agnostic.

    Row-local: a running-length aggregate over the turn array (the
    paragraph-packer recurrence shape), then posexplode of the
    trainable spans only.

    Mirrors `render_conversation`'s NULL-turn contract (r8 ADVICE): a
    conversation containing any NULL-role/NULL-content turn emits NO
    span rows — the rendered text is NULL there, so there is nothing
    the offsets could index into. Validate first to route such rows to
    quarantine instead of silently dropping them.
    """
    if template not in _TEMPLATES:
        raise ValueError(
            f"template must be one of {sorted(_TEMPLATES)}; got {template!r}"
        )
    conv = F.col(conv_col)
    lens = F.transform(conv, lambda t: F.length(_render_turn(t, template)))
    # ends[i] = cumulative length through turn i (inclusive)
    ends = F.aggregate(
        lens,
        F.array().cast("array<long>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0)) + x
            ),
        ),
    )
    # sequence(0, -1) would be a DESCENDING sequence — guard the empty
    # conversation; try_element_at (not element_at) because ANSI mode
    # throws on out-of-bounds
    idx = F.when(
        F.size(conv) > 0, F.sequence(F.lit(0), F.size(conv) - 1)
    ).otherwise(F.array().cast("array<int>"))
    all_turns_renderable = conv.isNotNull() & F.forall(
        conv, lambda t: t["role"].isNotNull() & t["content"].isNotNull()
    )
    # no otherwise(): a non-renderable conversation yields a NULL span
    # array, and posexplode of NULL emits no rows — the documented
    # nothing-to-index contract
    spans = F.when(
        all_turns_renderable,
        F.filter(
            F.zip_with(
                conv,
                idx,
                lambda t, i: F.struct(
                    i.alias("turn_idx"),
                    t["role"].alias("role"),
                    (
                        F.try_element_at(ends, i + 1)
                        - F.try_element_at(lens, i + 1)
                    ).alias("start"),
                    F.try_element_at(ends, i + 1).alias("end"),
                ),
            ),
            lambda s: s["role"].isin(*train_roles),
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(spans).alias("__i", "__s")
    ).select(
        id_col,
        F.col("__s.turn_idx").cast("int").alias("turn_idx"),
        F.col("__s.start").cast("long").alias("start"),
        F.col("__s.end").cast("long").alias("end"),
    )


def pack_conversations(
    rendered: DataFrame,
    spans: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    budget_chars: int,
    sep: str = "",
    partition_cols: tuple[str, ...] = (),
    carry_text: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Pack rendered conversations into training rows: short dialogs
    waste sequence capacity, so trainers concatenate several per row —
    which silently breaks every `loss_mask_spans` offset unless the
    masks shift with the packing. This does both together, the only
    safe order.

    First-fit-by-order packing (the `sequence_packing` recipe): bins
    are assigned by a running char total over id order — bin =
    floor(cumulative-length-before-this-example / budget) — so the
    result is deterministic and an example never splits across bins
    (never torn). Bins are budget-width WINDOWS of the running total:
    an over-budget dialog lands whole in whichever window its running
    total opened, which may also hold the shorter examples that opened
    that window — it does NOT get a bin to itself (same rule as
    `sequence_packing`; r8 ADVICE docstring fix).

    Returns ``(packed, packed_spans)``:

    - ``packed``: (bin_id, text, n_examples, n_chars) — dialogs joined
      by `sep` in id order;
    - ``packed_spans``: (bin_id, id, turn_idx, start, end) — the input
      spans with each example's bin offset (prior texts + separators)
      added, so ``packed.text[start:end]`` still slices the exact turn
      block (test-pinned).

    ``carry_text=True`` appends the bin's packed ``text`` to every
    ``packed_spans`` row — the same id-ordered ``sep``-joined
    concatenation as ``packed.text``, computed as a full-partition
    window riding the offset window's (partition_cols, bin_id)
    exchange and sort. A consumer that needs span AND text (slicing
    blocks out of the packed rows) then skips the join back to
    ``packed`` — and with it a SECOND derivation of the whole
    render → window chain, which is corpus-scale work (r16: the
    conversation_pack plan rendered every conversation twice). The
    cost is the bin text repeated per span row through the spans
    join — fine when consumed immediately; keep the default for a
    packed_spans that gets persisted.

    Scale shape: the bin-assignment running sum is a window over
    LENGTH-ONLY rows — pass `partition_cols` (e.g. source/shard) at
    scale so it parallelizes per partition key (the `sequence_packing`
    recipe; bin_id is then composite with those keys). Without them the
    window is GLOBAL — a deliberate single-task total order, fine for
    dataset-sized SFT corpora (millions of length rows in one task),
    wrong for web scale. Text shuffles once into bins for the concat;
    the spans adjust via an equi-join on id against the per-example
    (bin, offset) frame — one row per conversation, so no broadcast
    hint (AQE may still pick one when it fits).
    """
    if budget_chars < 1:
        raise ValueError(f"budget_chars must be >= 1, got {budget_chars}")
    if not partition_cols:
        import warnings

        warnings.warn(
            "pack_conversations without partition_cols assigns bins with a "
            "GLOBAL window — one task orders the whole corpus's length rows. "
            "Fine for dataset-sized SFT corpora; pass partition_cols (e.g. "
            "source/shard) at web scale.",
            stacklevel=2,
        )
    from pyspark.sql import Window

    sep_len = len(sep)
    pcols = [F.col(c) for c in partition_cols]
    sized = rendered.select(
        F.col(id_col), *pcols, F.col(text_col),
        F.length(text_col).alias("__len"),
    )
    w = (
        Window.partitionBy(*partition_cols).orderBy(id_col)
        if partition_cols
        else Window.orderBy(id_col)
    )
    # bin = floor((cumulative length BEFORE this example, counting one
    # separator per prior example) / budget): first-fit by order —
    # identical rule to queries' sequence_packing, in chars
    assigned = sized.withColumn(
        "__before",
        F.coalesce(
            F.sum(F.col("__len") + sep_len).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn("bin_id", F.floor(F.col("__before") / budget_chars))
    wb = Window.partitionBy(*partition_cols, "bin_id").orderBy(id_col)
    placed = assigned.withColumn(
        "__offset",
        F.coalesce(
            F.sum(F.col("__len") + sep_len).over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    if carry_text:
        # the bin's full packed text on every member row: identical
        # expression to packed's aggregate below (id-ordered struct
        # sort, sep join), evaluated over the whole (pcols, bin_id)
        # window — same partitioning and sort as __offset, so it rides
        # the exchange that is already there
        placed = placed.withColumn(
            "__bin_text",
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(id_col).alias("i"),
                                F.col(text_col).alias("t"),
                            )
                        ).over(
                            wb.rowsBetween(
                                Window.unboundedPreceding,
                                Window.unboundedFollowing,
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                sep,
            ),
        )
    packed = (
        placed.groupBy(*partition_cols, "bin_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(id_col).alias("i"),
                                                F.col(text_col).alias("t")))
                    ),
                    lambda s: s["t"],
                ),
                sep,
            ).alias(text_col),
            F.count(F.lit(1)).cast("int").alias("n_examples"),
        )
        .withColumn("n_chars", F.length(text_col).cast("long"))
    )
    carried = (("__bin_text",) if carry_text else ())
    offsets = placed.select(
        id_col, *partition_cols, "bin_id", "__offset", *carried
    )
    packed_spans = spans.join(offsets, id_col).select(
        *partition_cols,
        "bin_id",
        id_col,
        "turn_idx",
        (F.col("start") + F.col("__offset")).cast("long").alias("start"),
        (F.col("end") + F.col("__offset")).cast("long").alias("end"),
        *(
            (F.col("__bin_text").alias(text_col),)
            if carry_text
            else ()
        ),
    )
    return packed, packed_spans
