"""Conversation/SFT prep operators (operators/conversations.py).

Pins: structural validation reasons one by one, template rendering
exactness, loss-mask char spans verified by SLICING the rendered string
(the span must reproduce the turn's rendered block verbatim), empty/
edge conversations, and the row-local (no Exchange) plan contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.operators.conversations import (
    explode_turns,
    loss_mask_spans,
    render_conversation,
    validate_conversations,
)

SCHEMA = "conv_id long, conv array<struct<role:string,content:string>>"


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("conversations")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _conv(*turns):
    return [{"role": r, "content": c} for r, c in turns]


GOOD = _conv(
    ("system", "You are helpful."),
    ("user", "Hi there"),
    ("assistant", "Hello!"),
    ("user", "Bye"),
    ("assistant", "See you."),
)


def test_explode_turns(spark):
    df = spark.createDataFrame([(1, GOOD)], SCHEMA)
    rows = explode_turns(df, id_col="conv_id", conv_col="conv").collect()
    assert [(r["turn_idx"], r["role"]) for r in rows] == [
        (0, "system"), (1, "user"), (2, "assistant"), (3, "user"),
        (4, "assistant"),
    ]
    assert rows[2]["content"] == "Hello!"


@pytest.mark.parametrize(
    "conv,reason",
    [
        (GOOD, None),
        ([], "empty"),
        (_conv(("user", "hi"), ("bot", "yo")), "unknown_role"),
        (_conv(("user", "hi"), ("assistant", "  ")), "empty_content"),
        (_conv(("assistant", "hi first")), "body_must_start_with_user"),
        (
            _conv(("user", "a"), ("user", "b"), ("assistant", "c")),
            "non_alternating_roles",
        ),
        (_conv(("user", "a")), "no_assistant_turn"),
    ],
)
def test_validate_reasons(spark, conv, reason):
    df = spark.createDataFrame([(1, conv)], SCHEMA)
    r = validate_conversations(df, conv_col="conv").first()
    assert r["conv_invalid_reason"] == reason
    assert r["conv_valid"] == (reason is None)


def test_validate_knobs_relax(spark):
    non_alt = _conv(("user", "a"), ("user", "b"), ("assistant", "c"))
    df = spark.createDataFrame([(1, non_alt), (2, _conv(("user", "q")))], SCHEMA)
    out = {
        r["conv_id"]: r["conv_valid"]
        for r in validate_conversations(
            df, conv_col="conv", require_alternation=False,
            require_assistant=False,
        ).collect()
    }
    assert out == {1: True, 2: True}


def test_render_templates(spark):
    df = spark.createDataFrame([(1, GOOD[:3])], SCHEMA)
    chatml = render_conversation(df, conv_col="conv").first()["text"]
    assert chatml == (
        "<|system|>\nYou are helpful.<|end|>\n"
        "<|user|>\nHi there<|end|>\n"
        "<|assistant|>\nHello!<|end|>\n"
    )
    plain = render_conversation(df, conv_col="conv", template="plain").first()[
        "text"
    ]
    assert plain == "system: You are helpful.\nuser: Hi there\nassistant: Hello!\n"
    with pytest.raises(ValueError, match="template"):
        render_conversation(df, conv_col="conv", template="nope")


@pytest.mark.parametrize("template", ["chatml", "plain"])
def test_loss_mask_spans_slice_exactly(spark, template):
    df = spark.createDataFrame([(1, GOOD)], SCHEMA)
    text = render_conversation(df, conv_col="conv", template=template).first()[
        "text"
    ]
    spans = loss_mask_spans(
        df, id_col="conv_id", conv_col="conv", template=template
    ).collect()
    assert [r["turn_idx"] for r in spans] == [2, 4]  # assistant turns only
    head, tail = {"chatml": ("<|assistant|>\n", "<|end|>\n"),
                  "plain": ("assistant: ", "\n")}[template]
    expect = [head + "Hello!" + tail, head + "See you." + tail]
    got = [text[r["start"]:r["end"]] for r in spans]
    assert got == expect
    # spans tile without overlap and in order
    assert spans[0]["end"] <= spans[1]["start"]


def test_loss_mask_custom_roles_and_empty(spark):
    df = spark.createDataFrame([(1, GOOD), (2, [])], SCHEMA)
    spans = loss_mask_spans(
        df, id_col="conv_id", conv_col="conv",
        train_roles=("user", "assistant"),
    ).collect()
    assert [r["turn_idx"] for r in spans if r["conv_id"] == 1] == [1, 2, 3, 4]
    assert not [r for r in spans if r["conv_id"] == 2]  # empty conv: no rows


def test_row_local_plans(spark):
    df = spark.createDataFrame([(1, GOOD)], SCHEMA)
    for frame in (
        validate_conversations(df, conv_col="conv"),
        render_conversation(df, conv_col="conv"),
        loss_mask_spans(df, id_col="conv_id", conv_col="conv"),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_validate_null_role_is_invalid(spark):
    """Review finding: three-valued isin() let a NULL role validate."""
    conv = [
        {"role": None, "content": "sneaky"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "yo"},
    ]
    df = spark.createDataFrame([(1, conv)], SCHEMA)
    r = validate_conversations(df, conv_col="conv").first()
    assert r["conv_valid"] is False
    assert r["conv_invalid_reason"] == "unknown_role"


def test_validate_stray_system_is_invalid(spark):
    """Review finding: system turns anywhere but position 0 validated."""
    for conv, reason in [
        (_conv(("user", "a"), ("assistant", "b"), ("system", "late")),
         "system_not_leading"),
        (_conv(("system", "s1"), ("system", "s2"), ("user", "a"),
               ("assistant", "b")), "system_not_leading"),
        (GOOD, None),
    ]:
        df = spark.createDataFrame([(1, conv)], SCHEMA)
        r = validate_conversations(df, conv_col="conv").first()
        assert r["conv_invalid_reason"] == reason, conv


def test_pack_conversations_spans_still_slice(spark):
    from bp_datawarehouse_ordersfact_spark.operators.conversations import (
        pack_conversations,
    )

    convs = [
        (1, _conv(("user", "Hi"), ("assistant", "Hello there"))),
        (2, _conv(("user", "Q2"), ("assistant", "A2"))),
        (3, _conv(("user", "Q3 is long"), ("assistant", "A3 likewise here"))),
        (4, _conv(("user", "Q4"), ("assistant", "A4"))),
    ]
    df = spark.createDataFrame(convs, SCHEMA)
    rendered = render_conversation(df, conv_col="conv")
    spans = loss_mask_spans(df, id_col="conv_id", conv_col="conv")
    packed, pspans = pack_conversations(
        rendered.select("conv_id", "text"), spans,
        id_col="conv_id", budget_chars=80, sep="\n",
    )
    texts = {r["bin_id"]: r["text"] for r in packed.collect()}
    meta = {r["bin_id"]: (r["n_examples"], r["n_chars"]) for r in packed.collect()}
    # every adjusted span still slices the exact assistant block
    originals = {
        r["conv_id"]: r["text"] for r in rendered.select("conv_id", "text").collect()
    }
    orig_spans = {(r["conv_id"], r["turn_idx"]): (r["start"], r["end"])
                  for r in spans.collect()}
    for r in pspans.collect():
        want_s, want_e = orig_spans[(r["conv_id"], r["turn_idx"])]
        expect = originals[r["conv_id"]][want_s:want_e]
        got = texts[r["bin_id"]][r["start"]:r["end"]]
        assert got == expect, (r["conv_id"], r["turn_idx"])
    # accounting consistent
    assert sum(n for n, _ in meta.values()) == 4
    for b, (n, n_chars) in meta.items():
        assert n_chars == len(texts[b])
    # multiple examples actually packed together somewhere
    assert any(n > 1 for n, _ in meta.values())
    # packed text = examples joined with sep in id order within the bin
    for b, t in texts.items():
        ids = sorted(r["conv_id"] for r in pspans.collect() if r["bin_id"] == b)
        # reconstruct from originals of the DISTINCT ids in this bin
        uniq = sorted(set(ids))
        assert t == "\n".join(originals[i] for i in uniq)


def test_pack_conversations_carry_text_equals_join_back(spark):
    """carry_text=True (r16) must put on every packed_spans row the
    EXACT text that joining packed on bin_id would have attached —
    same rows otherwise (schema gains only the text column)."""
    from bp_datawarehouse_ordersfact_spark.operators.conversations import (
        pack_conversations,
    )

    convs = [
        (1, _conv(("user", "Hi"), ("assistant", "Hello there"))),
        (2, _conv(("user", "Q2"), ("assistant", "A2"))),
        (3, _conv(("user", "Q3 is long"), ("assistant", "A3 likewise here"))),
        (4, _conv(("user", "Q4"), ("assistant", "A4"))),
    ]
    df = spark.createDataFrame(convs, SCHEMA)
    rendered = render_conversation(df, conv_col="conv").select("conv_id", "text")
    spans = loss_mask_spans(df, id_col="conv_id", conv_col="conv")
    kw = dict(id_col="conv_id", budget_chars=80, sep="\n")
    packed, plain = pack_conversations(rendered, spans, **kw)
    _, carried = pack_conversations(rendered, spans, carry_text=True, **kw)
    assert carried.columns == plain.columns + ["text"]
    texts = {r["bin_id"]: r["text"] for r in packed.collect()}
    got = {
        (r["conv_id"], r["turn_idx"]): (r["bin_id"], r["start"], r["end"], r["text"])
        for r in carried.collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): (r["bin_id"], r["start"], r["end"])
        for r in plain.collect()
    }
    assert set(got) == set(want)
    for k, (b, s, e, t) in got.items():
        assert (b, s, e) == want[k]
        assert t == texts[b]


def test_pack_conversations_oversize_own_bin_and_validation(spark):
    from bp_datawarehouse_ordersfact_spark.operators.conversations import (
        pack_conversations,
    )

    convs = [
        (1, _conv(("user", "x" * 200), ("assistant", "y" * 200))),
        (2, _conv(("user", "a"), ("assistant", "b"))),
    ]
    df = spark.createDataFrame(convs, SCHEMA)
    rendered = render_conversation(df, conv_col="conv")
    spans = loss_mask_spans(df, id_col="conv_id", conv_col="conv")
    packed, _ = pack_conversations(
        rendered.select("conv_id", "text"), spans,
        id_col="conv_id", budget_chars=100,
    )
    rows = sorted(packed.collect(), key=lambda r: r["bin_id"])
    # the oversize dialog is FIRST, so the budget-width window it opens
    # holds it alone (the window rule — an oversize example elsewhere in
    # id order shares its window with whatever opened it), untorn
    assert [r["n_examples"] for r in rows] == [1, 1]
    assert rows[0]["n_chars"] > 100
    with pytest.raises(ValueError, match="budget_chars"):
        pack_conversations(
            rendered.select("conv_id", "text"), spans,
            id_col="conv_id", budget_chars=0,
        )


def test_sft_path_composes_with_corpus_build(spark, tmp_path):
    """End-to-end: validate -> render turns conversations into documents
    that flow through the staged corpus build unchanged — the SFT
    ingest path reuses the whole document tier."""
    from bp_datawarehouse_ordersfact_spark.pipelines.corpus_build import build_corpus

    def dlg(i, reply):
        return _conv(
            ("user", f"please explain topic number {i} in adequate detail"),
            ("assistant", reply),
        )

    convs = [
        (1, dlg(1, "here is a sufficiently long and unique explanation "
                    "about the first topic with many distinct words.")),
        (2, dlg(2, "a different long reply covering other material with "
                    "plenty of unique vocabulary to avoid dedup.")),
        # exact duplicate of 1's dialog -> must die at exact dedup
        (3, dlg(1, "here is a sufficiently long and unique explanation "
                    "about the first topic with many distinct words.")),
        # structurally invalid -> must die at validation
        (4, _conv(("assistant", "answer with no question preceding it"))),
    ]
    df = spark.createDataFrame(convs, SCHEMA)
    valid = validate_conversations(df, conv_col="conv").filter("conv_valid")
    docs = (
        render_conversation(valid, conv_col="conv")
        .select(
            F.col("conv_id").alias("doc_id"),
            "text",
            F.lit("sft").alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    m = build_corpus(
        spark, docs, str(tmp_path / "sft"),
        min_chars=50, chunk_tokens=30, chunk_stride=30, pack_budget=100,
    )
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(m["stages"]["02_deduped"]["path"]).collect()
    }
    assert kept == {1, 2}  # 4 failed validation, 3 died at exact dedup


def test_pack_conversations_partitioned(spark):
    """partition_cols parallelizes the packing per key: bins are
    composite with the partition column and never mix sources."""
    from bp_datawarehouse_ordersfact_spark.operators.conversations import (
        pack_conversations,
    )

    convs = [
        (i, _conv(("user", f"q{i}"), ("assistant", f"answer {i}")))
        for i in range(1, 7)
    ]
    df = spark.createDataFrame(convs, SCHEMA).withColumn(
        "source", F.when(F.col("conv_id") % 2 == 0, "even").otherwise("odd")
    )
    rendered = render_conversation(df, conv_col="conv")
    spans = loss_mask_spans(df, id_col="conv_id", conv_col="conv")
    packed, pspans = pack_conversations(
        rendered.select("conv_id", "source", "text"), spans,
        id_col="conv_id", budget_chars=60, partition_cols=("source",),
    )
    # a (source, bin) never mixes parities
    for r in pspans.collect():
        assert ("even" if r["conv_id"] % 2 == 0 else "odd") == r["source"]
    # spans still slice exactly
    texts = {(r["source"], r["bin_id"]): r["text"] for r in packed.collect()}
    originals = {r["conv_id"]: r["text"] for r in rendered.collect()}
    orig = {(r["conv_id"], r["turn_idx"]): (r["start"], r["end"])
            for r in spans.collect()}
    for r in pspans.collect():
        s0, e0 = orig[(r["conv_id"], r["turn_idx"])]
        assert (
            texts[(r["source"], r["bin_id"])][r["start"]:r["end"]]
            == originals[r["conv_id"]][s0:e0]
        )


def test_validate_null_conversation_flagged_under_every_knob(spark):
    """r8 ADVICE: a NULL conversation array must be invalid under EVERY
    knob combination — with the alternation/assistant checks off, the
    old when-chain saw only NULL predicates and fell through to the
    valid otherwise-arm."""
    df = spark.createDataFrame([(1, None), (2, [])], SCHEMA)
    for kwargs in (
        {},
        {"require_alternation": False},
        {"require_assistant": False},
        {"require_alternation": False, "require_assistant": False},
    ):
        rows = {
            r["conv_id"]: r
            for r in validate_conversations(df, conv_col="conv", **kwargs).collect()
        }
        for cid in (1, 2):
            assert rows[cid]["conv_valid"] is False, (cid, kwargs)
            assert rows[cid]["conv_invalid_reason"] == "empty", (cid, kwargs)


def test_render_and_spans_agree_on_null_turns(spark):
    """r8 ADVICE: a turn with NULL role/content must not let the
    rendered text and the span offsets diverge for callers that skip
    validation — render yields NULL text and loss_mask_spans emits no
    rows; valid rows in the same frame are untouched."""
    df = spark.createDataFrame(
        [
            (1, _conv(("user", "hi"), ("assistant", "hello"))),
            (2, [{"role": "user", "content": "q"},
                 {"role": None, "content": "dangling"},
                 {"role": "assistant", "content": "a"}]),
            (3, [{"role": "user", "content": None},
                 {"role": "assistant", "content": "a"}]),
        ],
        SCHEMA,
    )
    texts = {
        r["conv_id"]: r["text"]
        for r in render_conversation(df, conv_col="conv").collect()
    }
    assert texts[1] == "<|user|>\nhi<|end|>\n<|assistant|>\nhello<|end|>\n"
    assert texts[2] is None and texts[3] is None
    spans = loss_mask_spans(df, id_col="conv_id", conv_col="conv").collect()
    by_id = {}
    for r in spans:
        by_id.setdefault(r["conv_id"], []).append(r)
    assert set(by_id) == {1}  # NULL-turn conversations emit no spans
    (s,) = by_id[1]
    assert texts[1][s["start"] : s["end"]] == "<|assistant|>\nhello<|end|>\n"
