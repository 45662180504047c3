"""Persisted incremental-dedup layout (index/dedupidx.py): the
build → filter → append → re-filter lifecycle must match a pure-Python
model of the documented semantics for ANY corpus/batch, and the filter's
layout-side scan must never re-read corpus text."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_db_example_spark.index.dedupidx import (
    dedup_index_filter_verified,
    DedupIndex,
    build_dedup_index,
    dedup_index_append,
    dedup_index_filter,
)

PROP = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
)
texts = st.lists(words, min_size=0, max_size=10).map(" ".join)


# --- pure-Python model of the layout's documented semantics -------------


def model_sig(text: str, k: int = 3, n_hashes: int = 16):
    toks = text.strip().split(" ") if text.strip() else [""]
    if len(toks) - (k - 1) >= 1:
        sh = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    else:
        sh = {" ".join(toks)}
    return [
        min(hashlib.md5(f"{s}|{x}".encode()).hexdigest() for x in sh)
        for s in range(1, n_hashes + 1)
    ]


def model_bands(text: str, k: int = 3, n_hashes: int = 16, bands: int = 8):
    sig = model_sig(text, k, n_hashes)
    rpb = n_hashes // bands
    return {
        (b, hashlib.md5("".join(sig[b * rpb : (b + 1) * rpb]).encode()).hexdigest())
        for b in range(bands)
    }


def model_filter(corpus_keys: set, batch: list[tuple[int, str]]):
    """The module-docstring semantics: corpus_dup = any band hit on the
    layout; within_dup = shares a band with a lower-id non-corpus-dup
    batch doc (pessimistic one-pass — the suppressor need not itself
    survive)."""
    bands = {i: model_bands(t) for i, t in batch}
    corpus_dup = {i for i in bands if bands[i] & corpus_keys}
    new = [i for i, _ in batch if i not in corpus_dup]
    within = {
        i
        for i in new
        if any(min(j for j in new if bk in bands[j]) < i for bk in bands[i])
    }
    return {
        i: (i in corpus_dup, i in within) for i, _ in batch
    }


def _verdicts(spark, index, batch_df):
    return {
        r["doc_id"]: (r["corpus_dup"], r["within_dup"])
        for r in dedup_index_filter(spark, index, batch_df).collect()
    }


@PROP
@given(
    corpus=st.lists(texts, min_size=0, max_size=6),
    batch1=st.lists(texts, min_size=1, max_size=6),
    batch2=st.lists(texts, min_size=1, max_size=4),
)
def test_lifecycle_matches_model(spark, corpus, batch1, batch2, tmp_path_factory):
    """build → filter → append-survivors → re-filter equals the model at
    every stage, for any word-soup corpus (duplicate texts across and
    within frames arise naturally from the 8-word vocabulary)."""
    d = str(tmp_path_factory.mktemp("dedupidx"))
    cdocs = [(i, t) for i, t in enumerate(corpus)]
    b1 = [(100 + i, t) for i, t in enumerate(batch1)]
    b2 = [(200 + i, t) for i, t in enumerate(batch2)]

    cdf = spark.createDataFrame(cdocs or [], "doc_id long, text string")
    index = build_dedup_index(cdf, f"{d}/idx")

    keys = set().union(*(model_bands(t) for _, t in cdocs)) if cdocs else set()
    expect1 = model_filter(keys, b1)
    b1df = spark.createDataFrame(b1, "doc_id long, text string")
    assert _verdicts(spark, index, b1df) == expect1

    surv1 = [(i, t) for i, t in b1 if expect1[i] == (False, False)]
    dedup_index_append(
        index, spark.createDataFrame(surv1 or [], "doc_id long, text string")
    )
    keys2 = keys.union(*(model_bands(t) for _, t in surv1)) if surv1 else keys
    expect2 = model_filter(keys2, b2)
    b2df = spark.createDataFrame(b2, "doc_id long, text string")
    assert _verdicts(spark, DedupIndex.load(f"{d}/idx"), b2df) == expect2


def test_exact_copies_always_flagged(spark, tmp_path_factory):
    """Identical text ⇒ identical signature ⇒ every band collides: an
    exact copy of an indexed doc is ALWAYS corpus_dup, and an exact
    within-batch copy is ALWAYS within_dup on the higher id —
    deterministically, not probabilistically."""
    d = str(tmp_path_factory.mktemp("dedupidx_exact"))
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx")
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "spark writes band partitioned parquet layouts for dedup"),
            (12, "spark writes band partitioned parquet layouts for dedup"),
        ],
        "doc_id long, text string",
    )
    got = _verdicts(spark, index, batch)
    assert got == {10: (True, False), 11: (False, False), 12: (False, True)}


def test_declared_empty_bootstrap(spark, tmp_path_factory):
    """First-crawl bootstrap: a layout built over ZERO documents filters
    its first batch (nothing is corpus_dup; within-batch still applies),
    and the reloaded handle behaves identically."""
    d = str(tmp_path_factory.mktemp("dedupidx_empty"))
    empty = spark.createDataFrame([], "doc_id long, text string")
    build_dedup_index(empty, f"{d}/idx")
    index = DedupIndex.load(f"{d}/idx")
    batch = spark.createDataFrame(
        [(1, "one two three four"), (2, "one two three four"), (3, "five six")],
        "doc_id long, text string",
    )
    assert _verdicts(spark, index, batch) == {
        1: (False, False),
        2: (False, True),
        3: (False, False),
    }


def model_filter_verified(
    corpus: list[tuple[int, str]],
    batch: list[tuple[int, str]],
    threshold: float,
    cap: int,
):
    """dedup_index_filter_verified's documented semantics: band-collision
    candidates verified by the signature-equality fraction, with
    count-first mega-key routing (over-cap keys flag unverified)."""
    from collections import defaultdict

    bb = {i: model_bands(t) for i, t in batch}
    bsig = {i: model_sig(t) for i, t in batch}
    csig = {i: model_sig(t) for i, t in corpus}
    keyowners = defaultdict(set)
    for i, t in corpus:
        for bk in model_bands(t):
            keyowners[bk].add(i)
    over = {bk for bk, o in keyowners.items() if len(o) > cap}

    def sim(a, b):
        return sum(x == y for x, y in zip(a, b)) / len(a)

    corpus_dup = set()
    for i, _ in batch:
        if bb[i] & over:
            corpus_dup.add(i)
        elif any(
            sim(bsig[i], csig[c]) >= threshold
            for bk in bb[i]
            for c in keyowners.get(bk, ())
        ):
            corpus_dup.add(i)
    new = [i for i, _ in batch if i not in corpus_dup]
    wowners = defaultdict(set)
    for i in new:
        for bk in bb[i]:
            wowners[bk].add(i)
    within = set()
    for i in new:
        for bk in bb[i]:
            grp = wowners[bk]
            if len(grp) > cap:
                if i > min(grp):
                    within.add(i)
                    break
            elif any(j < i and sim(bsig[i], bsig[j]) >= threshold for j in grp):
                within.add(i)
                break
    return {i: (i in corpus_dup, i in within) for i, _ in batch}


@PROP
@given(
    corpus=st.lists(texts, min_size=0, max_size=6),
    batch=st.lists(texts, min_size=1, max_size=6),
    threshold=st.sampled_from([0.0, 0.25, 0.5, 1.0]),
    cap=st.sampled_from([0, 1, 64]),
)
def test_verified_filter_matches_model(
    spark, corpus, batch, threshold, cap, tmp_path_factory
):
    """The verified filter equals the model for any corpus/batch,
    threshold, and candidate cap — including cap=0, where every
    colliding key routes through the unverified mega-key path and the
    verdicts must collapse to the band-only filter's."""
    d = str(tmp_path_factory.mktemp("dedupidx_v"))
    cdocs = [(i, t) for i, t in enumerate(corpus)]
    b = [(100 + i, t) for i, t in enumerate(batch)]
    index = build_dedup_index(
        spark.createDataFrame(cdocs or [], "doc_id long, text string"), f"{d}/idx"
    )
    bdf = spark.createDataFrame(b, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["corpus_dup"], r["within_dup"])
        for r in dedup_index_filter_verified(
            spark, index, bdf, threshold=threshold, candidate_cap=cap
        ).collect()
    }
    assert got == model_filter_verified(cdocs, b, threshold, cap)
    if cap == 0 or threshold == 0.0:
        # collapses to the band-only semantics: cap=0 flags every
        # collision unverified; threshold=0 passes every candidate.
        band_only = {
            r["doc_id"]: (r["corpus_dup"], r["within_dup"])
            for r in dedup_index_filter(spark, index, bdf).collect()
        }
        assert got == band_only


def test_post_append_filter_sees_appends_in_one_action(spark, tmp_path_factory):
    """The exchange-reuse hazard from the module docstring: a pre-append
    filter MATERIALIZED via localCheckpoint, unioned with a post-append
    filter and collected in ONE action, must still show the post-append
    side the appended bands (file scans canonicalize by root path, so an
    unmaterialized pre-append scan can be substituted for the fresh one
    and silently hide the append)."""
    d = str(tmp_path_factory.mktemp("dedupidx_reuse"))
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    index = build_dedup_index(corpus, f"{d}/idx")
    batch1 = spark.createDataFrame(
        [(10, "one two three four five six seven")], "doc_id long, text string"
    )
    v1 = dedup_index_filter(spark, index, batch1).localCheckpoint(eager=True)
    dedup_index_append(index, batch1)  # 10 survived; accept it
    batch2 = spark.createDataFrame(
        [(20, "one two three four five six seven")], "doc_id long, text string"
    )
    v2 = dedup_index_filter(spark, index, batch2)
    rows = {
        r["doc_id"]: (r["corpus_dup"], r["within_dup"])
        for r in v1.unionByName(v2).collect()  # ONE action over both stages
    }
    assert rows == {10: (False, False), 20: (True, False)}


def test_filter_never_rereads_corpus_text(spark, tmp_path_factory):
    """The whole point of persisting band keys: checking a batch reads
    ONLY (band, key) from the layout — the accepted corpus's text is
    never re-shingled. Every parquet scan in the filter plan must be
    band/key-only."""
    d = str(tmp_path_factory.mktemp("dedupidx_plan"))
    corpus = spark.createDataFrame(
        [(i, f"document number {i} alpha beta gamma") for i in range(20)],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx")
    batch = spark.createDataFrame(
        [(100, "document number 3 alpha beta gamma")], "doc_id long, text string"
    )
    for frame in (
        dedup_index_filter(spark, index, batch),
        dedup_index_filter_verified(spark, index, batch, threshold=0.5),
    ):
        plan = frame._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert scans, "expected a parquet scan of the layout"
        assert all("text" not in ln for ln in scans), scans


# --- delete / compact lifecycle (round 8) --------------------------------


def test_delete_stops_suppressing_near_duplicates(spark, tmp_path_factory):
    """THE takedown/retention contract: after a corpus doc is deleted, a
    batch doc that exactly duplicates it must SURVIVE (pre-delete it was
    corpus_dup) — in both filter modes, immediately (tombstone read
    path) and after compaction (folded in, tombstone sibling gone)."""
    from vector_db_example_spark.index.dedupidx import (
        _tombstone_path,
        dedup_index_compact,
        dedup_index_delete,
    )
    from vector_db_example_spark import fsio

    d = str(tmp_path_factory.mktemp("dedupidx_del"))
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "entirely different corpus text about spark layouts"),
        ],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx")
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )

    def verdict(idx, mode):
        fn = dedup_index_filter if mode == "band" else (
            lambda s, i, b: dedup_index_filter_verified(s, i, b, threshold=0.5)
        )
        [r] = fn(spark, idx, batch).collect()
        return (r["corpus_dup"], r["within_dup"])

    assert verdict(index, "band") == (True, False)
    assert verdict(index, "verified") == (True, False)

    assert dedup_index_delete(spark, index, [1]) == 1
    assert verdict(index, "band") == (False, False)
    assert verdict(index, "verified") == (False, False)
    # idempotent: re-deleting a tombstoned id (or an absent one) is a no-op
    assert dedup_index_delete(spark, index, [1, 999]) == 0

    compacted = dedup_index_compact(spark, index, f"{d}/idx_v2")
    assert not fsio.exists(_tombstone_path(compacted), spark)
    assert verdict(compacted, "band") == (False, False)
    assert verdict(compacted, "verified") == (False, False)
    # doc 2 survived the compaction: its exact copy is still flagged
    [r] = dedup_index_filter(
        spark,
        compacted,
        spark.createDataFrame(
            [(20, "entirely different corpus text about spark layouts")],
            "doc_id long, text string",
        ),
    ).collect()
    assert (r["corpus_dup"], r["within_dup"]) == (True, False)


def test_delete_clears_stale_mega_key_counts(spark, tmp_path_factory):
    """A deleted boilerplate cluster must not keep its band key over the
    candidate cap: pre-delete, a colliding batch doc is auto-flagged
    unverified (mega-key route); post-delete the survivors are under the
    cap and the SIMILARITY ESTIMATE decides — a dissimilar doc that
    merely shares one lucky band must now survive."""
    from vector_db_example_spark.index.dedupidx import dedup_index_delete

    d = str(tmp_path_factory.mktemp("dedupidx_mega"))
    boiler = "terms of service apply to all documents here"
    corpus = spark.createDataFrame(
        [(i, boiler) for i in range(5)] + [(100, "unrelated corpus doc")],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx")
    batch = spark.createDataFrame([(10, boiler)], "doc_id long, text string")
    [r] = dedup_index_filter_verified(
        spark, index, batch, threshold=0.5, candidate_cap=3
    ).collect()
    assert r["corpus_dup"]  # 5 copies > cap=3: auto-flagged via mega-key
    # delete 3 of the 5 boilerplate copies: the key drops to 2 ≤ cap, so
    # candidates now route through verification — an exact copy still
    # clears the estimate (sim=1.0) ...
    assert dedup_index_delete(spark, index, [0, 1, 2]) == 3
    [r] = dedup_index_filter_verified(
        spark, index, batch, threshold=0.5, candidate_cap=3
    ).collect()
    assert r["corpus_dup"]
    # ... and deleting ALL copies frees the batch doc entirely
    assert dedup_index_delete(spark, index, [3, 4]) == 2
    [r] = dedup_index_filter_verified(
        spark, index, batch, threshold=0.5, candidate_cap=3
    ).collect()
    assert not r["corpus_dup"]


def test_compact_heals_replay_duplicates_and_collapses_files(
    spark, tmp_path_factory
):
    """At-least-once replay lays the same append down twice (byte-
    identical rows). Compaction collapses them — one sig row and one
    band row per (doc, band) — without changing any verdict."""
    from vector_db_example_spark.index.dedupidx import (
        _read_bands,
        _read_sigs,
        dedup_index_compact,
    )

    d = str(tmp_path_factory.mktemp("dedupidx_replay"))
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    index = build_dedup_index(corpus, f"{d}/idx")
    batch = spark.createDataFrame(
        [(10, "one two three four five")], "doc_id long, text string"
    )
    dedup_index_append(index, batch)
    dedup_index_append(index, batch)  # the replay
    assert _read_sigs(spark, index).filter("doc_id = 10").count() == 2
    compacted = dedup_index_compact(spark, index, f"{d}/idx_v2")
    assert _read_sigs(spark, compacted).filter("doc_id = 10").count() == 1
    bands = _read_bands(spark, compacted)
    assert bands.count() == bands.distinct().count() == 2 * index.bands
    got = {
        r["doc_id"]: (r["corpus_dup"], r["within_dup"])
        for r in dedup_index_filter(
            spark,
            compacted,
            spark.createDataFrame(
                [(20, "one two three four five"), (21, "six seven eight")],
                "doc_id long, text string",
            ),
        ).collect()
    }
    assert got == {20: (True, False), 21: (False, False)}


def test_compact_delete_to_empty(spark, tmp_path_factory):
    """Fully-tombstoned layout compacts to a well-typed EMPTY layout (the
    declared-empty read path): the next batch sees no corpus_dup and
    within-batch semantics still apply."""
    from vector_db_example_spark.index.dedupidx import (
        dedup_index_compact,
        dedup_index_delete,
    )

    d = str(tmp_path_factory.mktemp("dedupidx_empty2"))
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx")
    assert dedup_index_delete(spark, index, [1, 2]) == 2
    compacted = dedup_index_compact(spark, index, f"{d}/idx_v2")
    got = _verdicts(
        spark,
        compacted,
        spark.createDataFrame(
            [(10, "alpha beta gamma delta"), (11, "alpha beta gamma delta")],
            "doc_id long, text string",
        ),
    )
    assert got == {10: (False, False), 11: (False, True)}


@PROP
@given(
    corpus=st.lists(texts, min_size=1, max_size=6),
    batch=st.lists(texts, min_size=1, max_size=6),
    n_del=st.integers(min_value=0, max_value=6),
)
def test_delete_compact_match_model(
    spark, corpus, batch, n_del, tmp_path_factory
):
    """delete → filter → compact → re-filter equals the pure-Python model
    evaluated over the SURVIVING corpus only, for any word-soup corpus
    and any delete subset — in both filter modes (threshold=0.5 with the
    default cap for the verified one)."""
    d = str(tmp_path_factory.mktemp("dedupidx_dm"))
    cdocs = [(i, t) for i, t in enumerate(corpus)]
    victims = [i for i, _ in cdocs[:n_del]]
    survivors = cdocs[n_del:]
    b = [(100 + i, t) for i, t in enumerate(batch)]

    from vector_db_example_spark.index.dedupidx import (
        dedup_index_compact,
        dedup_index_delete,
    )

    index = build_dedup_index(
        spark.createDataFrame(cdocs, "doc_id long, text string"), f"{d}/idx"
    )
    assert dedup_index_delete(spark, index, victims) == len(victims)
    keys = (
        set().union(*(model_bands(t) for _, t in survivors)) if survivors else set()
    )
    bdf = spark.createDataFrame(b, "doc_id long, text string")
    expect = model_filter(keys, b)
    expect_v = model_filter_verified(survivors, b, 0.5, 64)
    for idx in (index, dedup_index_compact(spark, index, f"{d}/idx_v2")):
        assert _verdicts(spark, idx, bdf) == expect
        got_v = {
            r["doc_id"]: (r["corpus_dup"], r["within_dup"])
            for r in dedup_index_filter_verified(
                spark, idx, bdf, threshold=0.5
            ).collect()
        }
        assert got_v == expect_v


def test_band_filter_never_shuffles_layout(spark, tmp_path_factory):
    """The band-only filter's corpus test must evaluate as
    ``layout ⋉ broadcast(batch keys)`` + a broadcast-back of the
    surviving keys — explicit hints, so the layout is streamed map-side
    and NEVER exchanged even when it is too big for auto-broadcast. We
    pin that by disabling autoBroadcastJoinThreshold: the two
    LeftSemi BroadcastHashJoins can then only come from the explicit
    hints (the old plan degraded to a SortMergeJoin that re-shuffled
    the whole corpus band table per batch once the layout crossed
    ~10 MB)."""
    d = str(tmp_path_factory.mktemp("dedupidx_noshuffle"))
    corpus = spark.createDataFrame(
        [(i, f"document number {i} alpha beta gamma") for i in range(30)],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx")
    batch = spark.createDataFrame(
        [
            (100, "document number 3 alpha beta gamma"),
            (101, "fresh unrelated content entirely"),
        ],
        "doc_id long, text string",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        frame = dedup_index_filter(spark, index, batch)
        plan = frame._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert plan.count("BroadcastHashJoin LeftSemi") >= 2, plan
        got = {
            r["doc_id"]: (r["corpus_dup"], r["within_dup"])
            for r in frame.collect()
        }
        assert got == {100: (True, False), 101: (False, False)}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# --- bucketed signature side-car (round 11) -------------------------------


def test_sig_sidecar_bucketed_and_pruned(spark, tmp_path_factory):
    """The default layout partitions the signature side-car by
    ``pmod(id, sig_buckets)`` and the verified filter's candidate fetch
    reads ONLY the buckets holding candidate ids — the scan node must
    carry a sig_bucket partition filter, so the per-batch cost no
    longer grows with corpus size (the round-10 verdict's top gap)."""
    import os

    from vector_db_example_spark.index.dedupidx import _sigs_path

    d = str(tmp_path_factory.mktemp("dedupidx_bkt"))
    corpus = spark.createDataFrame(
        [(i, f"document number {i} alpha beta gamma") for i in range(20)],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx", sig_buckets=8)
    assert index.sig_buckets == 8
    subdirs = {
        p for p in os.listdir(_sigs_path(index)) if p.startswith("sig_bucket=")
    }
    assert subdirs, "expected sig_bucket= partition directories"
    assert subdirs <= {f"sig_bucket={b}" for b in range(8)}
    batch = spark.createDataFrame(
        [(100, "document number 3 alpha beta gamma")], "doc_id long, text string"
    )
    frame = dedup_index_filter_verified(spark, index, batch, threshold=0.5)
    plan = frame._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "sig_bucket" in plan, plan
    # and the verdicts are unchanged by the pruning
    [r] = frame.collect()
    assert (r["corpus_dup"], r["within_dup"]) == (True, False)


def test_legacy_unbucketed_layout_still_works(spark, tmp_path_factory):
    """sig_buckets=0 keeps the pre-round-11 unpartitioned side-car and
    full-scan verify path; a meta JSON without the field loads as 0
    (backward compatibility with layouts persisted by earlier rounds)."""
    import json
    import os

    from vector_db_example_spark.index.dedupidx import _sigs_path

    d = str(tmp_path_factory.mktemp("dedupidx_legacy"))
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx", sig_buckets=0)
    assert not any(
        p.startswith("sig_bucket=") for p in os.listdir(_sigs_path(index))
    )
    # strip the field from the meta to simulate a pre-round-11 layout
    meta_path = f"{d}/idx/_dedup_meta.json"
    meta = json.loads(open(meta_path).read())
    meta.pop("sig_buckets")
    open(meta_path, "w").write(json.dumps(meta))
    crc = f"{d}/idx/._dedup_meta.json.crc"  # hadoop LocalFS checksum sibling
    if os.path.exists(crc):
        os.remove(crc)
    loaded = DedupIndex.load(f"{d}/idx")
    assert loaded.sig_buckets == 0
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"), (11, "unrelated")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["corpus_dup"], r["within_dup"])
        for r in dedup_index_filter_verified(
            spark, loaded, batch, threshold=0.5
        ).collect()
    }
    assert got == {10: (True, False), 11: (False, False)}


def test_compact_migrates_sig_buckets(spark, tmp_path_factory):
    """A legacy unpartitioned layout migrates onto the bucket-pruned
    verified read path through ONE ordinary compaction with a
    ``sig_buckets`` override — no corpus re-shingle (signatures are
    already persisted) — and the verdicts are identical before and
    after: bucketing moves sig rows, never changes their values. The
    downgrade direction (bucketed → 0) must also round-trip, dropping
    the directory-derived column cleanly."""
    import os

    from vector_db_example_spark.index.dedupidx import (
        _sigs_path,
        dedup_index_compact,
    )

    d = str(tmp_path_factory.mktemp("dedupidx_migrate"))
    corpus = spark.createDataFrame(
        [(i, f"document number {i} alpha beta gamma") for i in range(12)],
        "doc_id long, text string",
    )
    legacy = build_dedup_index(corpus, f"{d}/idx", sig_buckets=0)
    batch = spark.createDataFrame(
        [
            (100, "document number 3 alpha beta gamma"),
            (101, "totally unrelated fresh content here"),
        ],
        "doc_id long, text string",
    )

    def verified(idx):
        return {
            r["doc_id"]: (r["corpus_dup"], r["within_dup"])
            for r in dedup_index_filter_verified(
                spark, idx, batch, threshold=0.5
            ).collect()
        }

    before = verified(legacy)
    assert before == {100: (True, False), 101: (False, False)}

    migrated = dedup_index_compact(spark, legacy, f"{d}/idx_v2", sig_buckets=8)
    assert migrated.sig_buckets == 8
    assert DedupIndex.load(f"{d}/idx_v2").sig_buckets == 8
    assert any(
        p.startswith("sig_bucket=") for p in os.listdir(_sigs_path(migrated))
    )
    assert verified(migrated) == before

    # downgrade: bucketed → unpartitioned, verdicts still identical
    downgraded = dedup_index_compact(spark, migrated, f"{d}/idx_v3", sig_buckets=0)
    assert downgraded.sig_buckets == 0
    assert not any(
        p.startswith("sig_bucket=") for p in os.listdir(_sigs_path(downgraded))
    )
    assert verified(downgraded) == before


def test_bucketed_append_compact_preserve_buckets(spark, tmp_path_factory):
    """Appends land in the right bucket partitions and compaction keeps
    the bucketing (so the pruned verify path survives maintenance)."""
    import os

    from vector_db_example_spark.index.dedupidx import (
        _sigs_path,
        dedup_index_compact,
    )

    d = str(tmp_path_factory.mktemp("dedupidx_bkt2"))
    corpus = spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    index = build_dedup_index(corpus, f"{d}/idx", sig_buckets=4)
    dedup_index_append(
        index,
        spark.createDataFrame(
            [(6, "one two three four five")], "doc_id long, text string"
        ),
    )
    dirs = {p for p in os.listdir(_sigs_path(index)) if p.startswith("sig_bucket=")}
    assert dirs == {"sig_bucket=3", "sig_bucket=2"}  # pmod(3,4), pmod(6,4)
    compacted = dedup_index_compact(spark, index, f"{d}/idx_v2")
    assert compacted.sig_buckets == 4
    dirs2 = {
        p for p in os.listdir(_sigs_path(compacted)) if p.startswith("sig_bucket=")
    }
    assert dirs2 == {"sig_bucket=3", "sig_bucket=2"}
    got = _verdicts(
        spark,
        compacted,
        spark.createDataFrame(
            [(20, "one two three four five")], "doc_id long, text string"
        ),
    )
    assert got == {20: (True, False)}


# --- round-12: count-first verified filter + bucket-pruned delete ---------


def test_verified_filter_checkpoints_only_batch_bounded_frames(
    spark, tmp_path_factory, monkeypatch
):
    """The verified filter must never materialize a collision-proportional
    frame (VERDICT r11 gap #1): against a corpus holding a 60-copy
    boilerplate cluster, every localCheckpoint the filter takes has to be
    bounded by the BATCH (signatures, per-key counts, under-cap candidate
    pairs) — the pre-round-12 shape checkpointed the full restricted
    collision frame first (8 bands x 60 copies = 480 rows here, and
    near-corpus rows on a real boilerplate-heavy batch) before the
    mega-key cap routed it away."""
    # patch the CONCRETE class (pyspark.sql.DataFrame is an abstract
    # facade in PySpark 4; method lookup resolves on the classic class)
    SparkDF = type(spark.range(1))

    d = str(tmp_path_factory.mktemp("dedupidx_cf"))
    boiler = [(i, "lorem ipsum dolor sit amet consectetur") for i in range(60)]
    distinct = [(100, "one two three four five six"), (101, "seven eight nine ten")]
    index = build_dedup_index(
        spark.createDataFrame(boiler + distinct, "doc_id long, text string"),
        f"{d}/idx",
    )
    counts: list[int] = []
    orig = SparkDF.localCheckpoint

    def spy(self, eager=True):
        out = orig(self, eager=eager)
        counts.append(out.count())
        return out

    monkeypatch.setattr(SparkDF, "localCheckpoint", spy)
    batch = spark.createDataFrame(
        [
            (200, "lorem ipsum dolor sit amet consectetur"),  # hot-key collider
            (201, "entirely fresh content nothing shared"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["corpus_dup"], r["within_dup"])
        for r in dedup_index_filter_verified(
            spark, index, batch, threshold=0.5, candidate_cap=2
        ).collect()
    }
    assert got == {200: (True, False), 201: (False, False)}
    # bsigs (2 rows), key_counts (<= 16 batch keys), bucketed cand pairs
    # (0 here - the hot key is over-cap). The old shape would have
    # recorded 480.
    assert counts, "expected the filter to materialize its bounded frames"
    assert max(counts) <= 32, counts


def test_delete_victim_scan_is_bucket_pruned(spark, tmp_path_factory):
    """On bucketed layouts, delete's victim resolution must read only the
    victims' ``sig_bucket`` partitions (driver-side pmod of the ids), not
    the full side-car id column (VERDICT r11 gap #2)."""
    from vector_db_example_spark.index.dedupidx import (
        _delete_victims,
        dedup_index_delete,
    )

    d = str(tmp_path_factory.mktemp("dedupidx_delprune"))
    # per-doc-unique words: no cross-doc shingles, so deleting doc 3
    # removes the ONLY corpus doc its duplicate can collide with
    corpus = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(20)],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx", sig_buckets=8)
    victims = _delete_victims(spark, index, [3, 11])  # both pmod to bucket 3
    plan = victims._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "sig_bucket" in plan, plan
    assert "PartitionFilters: []" not in plan, plan
    # and the real delete still behaves: both ids tombstone, re-delete is
    # a no-op, and the filter stops flagging their duplicates
    assert dedup_index_delete(spark, index, [3, 11]) == 2
    assert dedup_index_delete(spark, index, [3, 11]) == 0
    got = _verdicts(
        spark,
        index,
        spark.createDataFrame(
            [(100, "w3a w3b w3c w3d w3e")],
            "doc_id long, text string",
        ),
    )
    assert got == {100: (False, False)}


def test_parse_byte_string_mirrors_spark_units(spark):
    """The Python threshold parser must agree with Spark's JavaUtils
    suffix table (the advisor's Spark-Connect-surface fix) and reject
    garbage the JVM would reject."""
    import pytest

    from vector_db_example_spark.index.dedupidx import (
        _fits_auto_broadcast,
        _parse_byte_string,
    )

    assert _parse_byte_string("-1") == -1
    assert _parse_byte_string("10485760b") == 10 * 1024 * 1024
    assert _parse_byte_string("10MB") == 10 * 1024 * 1024
    assert _parse_byte_string(" 2g ") == 2 * 1024**3
    assert _parse_byte_string("1K") == 1024
    # the conf layer (ConfigHelpers.byteFromString) strips ONE leading
    # '-' and negates, so '-1k' is a valid disable value Spark itself
    # accepts — it must parse negative, not raise (advisor, round 13)
    assert _parse_byte_string("-1k") == -1024
    assert _parse_byte_string("-10MB") == -10 * 1024 * 1024
    # ConfigHelpers checks charAt(0) BEFORE any trim, so a space-led
    # negative is garbage to Spark and must stay garbage here
    for bad in ("", "10XB", "ten", "10 10", "--1k", " -1k"):
        with pytest.raises(ValueError):
            _parse_byte_string(bad)
    # ...and a negative threshold takes the DISABLED path, not a crash
    class _NeverAsked:
        @property
        def _jdf(self):  # pragma: no cover - must not be reached
            raise AssertionError("disabled threshold must not touch the plan")

    class _NegConf:
        class conf:
            @staticmethod
            def get(k):
                return "-1k"

    assert _fits_auto_broadcast(_NegConf, _NeverAsked()) is False
    # unavailable plan stats (Spark Connect has no _jdf -> an
    # AttributeError subclass) must report not-fitting - the caller then
    # takes the restriction path, which keeps the layout unshuffled
    # either way
    class _NoJdf:
        @property
        def _jdf(self):
            raise AttributeError("no classic-session JVM handle")

    assert _fits_auto_broadcast(spark, _NoJdf()) is False
    # ...but a genuine plan/analysis failure must SURFACE, not silently
    # flip the join strategy (the narrowed except - advisor, round 12)
    class _BrokenPlan:
        @property
        def _jdf(self):
            raise RuntimeError("analysis exploded")

    with pytest.raises(RuntimeError):
        _fits_auto_broadcast(spark, _BrokenPlan())
    # JVM-side failures arrive as Py4JJavaError (⊂ Py4JError): the JVM
    # evaluated the plan and threw, so they must surface too — only
    # bare gateway/protocol faults map to not-fitting (advisor,
    # round 13: the round-12 blanket Py4JError catch still swallowed
    # Py4JJavaError)
    from py4j.protocol import Py4JError, Py4JJavaError

    class _FakeJavaException:  # Py4JJavaError.__init__ reads _target_id
        _target_id = "o0"

    class _JvmThrew:
        @property
        def _jdf(self):
            raise Py4JJavaError(
                "analysis exception from the JVM", _FakeJavaException()
            )

    with pytest.raises(Py4JJavaError):
        _fits_auto_broadcast(spark, _JvmThrew())

    class _GatewayDown:
        @property
        def _jdf(self):
            raise Py4JError("connection refused while talking to the gateway")

    assert _fits_auto_broadcast(spark, _GatewayDown()) is False


def test_over_ceiling_fallback_matches_broadcast_path(
    spark, tmp_path_factory, monkeypatch
):
    """Both filters fall back to plain shuffle joins when the batch's
    key count exceeds _BROADCAST_KEYS_MAX (the round-10 advisor fix; the
    round-12 count-first rewrite added an un-broadcast `under` leg to
    that branch). Forcing the ceiling to 0 must change the PLAN only:
    verdicts identical to the broadcast path in both modes."""
    import vector_db_example_spark.index.dedupidx as dd

    d = str(tmp_path_factory.mktemp("dedupidx_ceiling"))
    corpus = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(12)]
        + [(100 + i, "shared boilerplate text alpha beta") for i in range(5)],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx")
    batch = spark.createDataFrame(
        [
            (200, "w3a w3b w3c w3d w3e"),          # exact plant
            (201, "shared boilerplate text alpha beta"),  # mega-key collider
            (202, "fresh unseen content entirely"),
            (203, "fresh unseen content entirely"),  # within-batch dup
        ],
        "doc_id long, text string",
    )

    def run_both():
        band = {
            r["doc_id"]: (r["corpus_dup"], r["within_dup"])
            for r in dedup_index_filter(spark, index, batch).collect()
        }
        ver = {
            r["doc_id"]: (r["corpus_dup"], r["within_dup"])
            for r in dedup_index_filter_verified(
                spark, index, batch, threshold=0.5, candidate_cap=2
            ).collect()
        }
        return band, ver

    band_bc, ver_bc = run_both()
    monkeypatch.setattr(dd, "_BROADCAST_KEYS_MAX", 0)
    band_fb, ver_fb = run_both()
    assert band_fb == band_bc
    assert ver_fb == ver_bc
    assert band_bc[200] == (True, False)
    assert ver_bc[201] == (True, False)  # mega-key auto route
    assert ver_bc[203] == (False, True)


def test_verified_filter_skips_sig_subtree_when_no_under_cap_key(
    spark, tmp_path_factory, monkeypatch
):
    """When every colliding (band, key) is over-cap — or nothing collides
    at all — the candidate set is provably empty, so the filter must not
    touch the signature side-car: no ``_read_sigs`` call, hence no
    candidate checkpoint, bucket collect, or side-car scan jobs over
    provably-empty frames (advisor finding, round 12). An under-cap
    collider must still trigger the read."""
    import vector_db_example_spark.index.dedupidx as dd

    d = str(tmp_path_factory.mktemp("dedupidx_skip"))
    corpus = spark.createDataFrame(
        [(i, "lorem ipsum dolor sit amet consectetur") for i in range(10)]
        + [(50, "one two three four five six seven")],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx", sig_buckets=8)
    calls: list[int] = []
    orig = dd._read_sigs

    def spy(sp, idx):
        calls.append(1)
        return orig(sp, idx)

    monkeypatch.setattr(dd, "_read_sigs", spy)
    # every collision hits the over-cap boilerplate key; the fresh doc
    # collides with nothing — no under-cap key anywhere
    hot = spark.createDataFrame(
        [
            (200, "lorem ipsum dolor sit amet consectetur"),
            (201, "entirely fresh content nothing shared here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["corpus_dup"], r["within_dup"])
        for r in dedup_index_filter_verified(
            spark, index, hot, threshold=0.5, candidate_cap=2
        ).collect()
    }
    assert got == {200: (True, False), 201: (False, False)}
    assert calls == [], "side-car read on a provably-empty candidate set"
    # an under-cap collider (the singleton corpus doc) re-arms the read
    probe = spark.createDataFrame(
        [(300, "one two three four five six seven")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["corpus_dup"], r["within_dup"])
        for r in dedup_index_filter_verified(
            spark, index, probe, threshold=0.5, candidate_cap=2
        ).collect()
    }
    assert got == {300: (True, False)}
    assert calls, "under-cap collider must reach the verification join"


def test_verified_filter_fresh_batch_plan_collapses(
    spark, tmp_path_factory, monkeypatch
):
    """Fresh-path short-circuits (round 14): a batch where nothing
    collides with the layout AND no (band, key) is shared by two batch
    docs must return a verdict plan that never scans the layout (the
    over-cap semi-join is dropped once the materialized key counts are
    empty) and never builds the similarity estimator into the plan (the
    within-batch algebra is provably empty when every batch group has
    size 1). A within-batch duplicate pair must re-arm the estimator."""
    import vector_db_example_spark.index.dedupidx as dd

    d = str(tmp_path_factory.mktemp("dedupidx_fresh"))
    corpus = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(10)],
        "doc_id long, text string",
    )
    index = build_dedup_index(corpus, f"{d}/idx", sig_buckets=8)
    calls: list[int] = []
    orig = dd._est_sim

    def spy(a, b, n):
        calls.append(1)
        return orig(a, b, n)

    monkeypatch.setattr(dd, "_est_sim", spy)
    fresh = spark.createDataFrame(
        [
            (200, "alpha beta gamma delta epsilon zeta"),
            (201, "eta theta iota kappa lambda mu nu"),
        ],
        "doc_id long, text string",
    )
    v = dedup_index_filter_verified(
        spark, index, fresh, threshold=0.5, candidate_cap=2
    )
    plan = v._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert f"{d}/idx" not in plan, plan  # no layout scan in the verdict plan
    got = {r["doc_id"]: (r["corpus_dup"], r["within_dup"]) for r in v.collect()}
    assert got == {200: (False, False), 201: (False, False)}
    assert calls == [], "estimator built into a provably-empty plan"
    # a within-batch duplicate pair re-arms the within algebra (and the
    # verdict still assembles correctly alongside the empty corpus side)
    wb = spark.createDataFrame(
        [
            (300, "one two three four five six"),
            (301, "one two three four five six"),
            (302, "totally different content goes here now"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["corpus_dup"], r["within_dup"])
        for r in dedup_index_filter_verified(
            spark, index, wb, threshold=0.5, candidate_cap=2
        ).collect()
    }
    assert got == {
        300: (False, False),
        301: (False, True),
        302: (False, False),
    }
    assert calls, "within-batch pair must reach the verification estimator"


def test_python_sig_kernel_matches_catalyst_expression(spark):
    """The round-15 mapInPandas signature kernel must equal the original
    Catalyst ``minhash_signature(shingles(...))`` expression byte-for-byte
    on adversarial inputs: Java-vs-Python ``\\s`` class edges (tab,
    vertical tab, form feed, CR/LF, and the UNICODE spaces Java's ASCII
    class must NOT split on), space-only trim edges, short/empty texts,
    multi-byte UTF-8, and NULL (a length-n array of NULLs, not a null
    array)."""
    from vector_db_example_spark.index.dedupidx import signature_rows
    from vector_db_example_spark.operators.dedup import (
        minhash_signature,
        shingles,
    )

    rows = [
        (0, "plain three word text here"),
        (1, "two words"),
        (2, "one"),
        (3, ""),
        (4, "   "),
        (5, " \t leading mixed\twhitespace\n and trailing \t "),
        (6, "a b c d"),          # NBSP: Java \s does NOT split it
        (7, "a b c d"),          # EM space: same
        (8, "tabs\tonly\there"),
        (9, "cr\rand\nlf\x0band\x0cfeeds split like java"),
        (10, "unicode 一二三 鿿 tokens mixed in"),
        (11, "dup dup dup dup dup"),
        (12, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    index = DedupIndex(
        path="/unused", shingle_k=3, n_hashes=16, bands=8,
        id_col="doc_id", text_col="text", sig_buckets=0,
    )
    got = {
        r["doc_id"]: (list(r["sig"]) if r["sig"] is not None else None)
        for r in signature_rows(index, docs).collect()
    }
    want = {
        r["doc_id"]: (list(r["sig"]) if r["sig"] is not None else None)
        for r in docs.select(
            "doc_id",
            minhash_signature(
                shingles(F.col("text"), k=3), n_hashes=16
            ).alias("sig"),
        ).collect()
    }
    assert got == want


def test_append_rows_equals_recompute_append(spark, tmp_path_factory):
    """``dedup_index_append_rows`` (the crawl loop's zero-recompute
    append, fed from the filter's materialized checkpoint) must leave a
    layout whose sig AND band contents equal the recompute append's —
    and a subsequent filter must return identical verdicts either way."""
    from vector_db_example_spark.index.dedupidx import (
        _read_bands,
        _read_sigs,
        dedup_index_append_rows,
        dedup_index_filter_with_rows,
    )

    base = str(tmp_path_factory.mktemp("dedupidx_rows"))
    corpus = spark.createDataFrame(
        [(i, f"c{i}x c{i}y c{i}z c{i}w c{i}v") for i in range(8)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100 + i, f"b{i}p b{i}q b{i}r b{i}s {'c0x c0y c0z c0w c0v' if i == 0 else 'fresh'}")
         for i in range(6)]
        + [(200, "c1x c1y c1z c1w c1v")],  # exact corpus dup: not appended
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(300, "b1p b1q b1r b1s fresh"), (301, "never seen words only here")],
        "doc_id long, text string",
    )
    layouts = {}
    for mode in ("docs", "rows"):
        idx = build_dedup_index(corpus, f"{base}/{mode}", sig_buckets=8)
        verdicts, rows = dedup_index_filter_with_rows(spark, idx, batch)
        verdicts = verdicts.localCheckpoint(eager=True)
        surv = verdicts.filter("NOT corpus_dup AND NOT within_dup").select(
            "doc_id"
        )
        if mode == "docs":
            dedup_index_append(idx, batch.join(surv, "doc_id"))
        else:
            dedup_index_append_rows(idx, rows.join(surv, "doc_id", "left_semi"))
        layouts[mode] = (
            sorted(map(tuple, _read_bands(spark, idx).collect())),
            sorted(
                (r["doc_id"], tuple(r["sig"]))
                for r in _read_sigs(spark, idx).select("doc_id", "sig").collect()
            ),
            sorted(
                map(
                    tuple,
                    dedup_index_filter_with_rows(spark, idx, probe)[0].collect(),
                )
            ),
        )
    assert layouts["docs"] == layouts["rows"]


def test_append_repartition_size_gate(spark, tmp_path):
    """Round-16 size gate on the partitioned-append collapse
    (sources/tables.py::append_repartition): a micro-batch append still
    lands ONE file per touched band partition (the round-15 small-files
    discipline), while a frame whose size estimate exceeds the collapse
    ceiling keeps the caller's write parallelism — it must NOT
    serialize onto ≤ distinct-partition-value tasks."""
    import glob

    from vector_db_example_spark.sources import tables
    from vector_db_example_spark.index.dedupidx import build_dedup_index, dedup_index_append

    def band_files(root: str) -> dict[int, int]:
        return {
            b: len(glob.glob(f"{root}/band={b}/*.parquet"))
            for b in range(8)
        }

    docs = spark.range(64).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta text "), F.col("id").cast("string")).alias("text"),
    )
    batch = spark.range(64, 128).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("epsilon zeta eta theta text "), F.col("id").cast("string")).alias("text"),
    ).repartition(8).localCheckpoint(eager=True)

    # micro-batch append: the default ceiling collapses the write
    idx = build_dedup_index(docs, str(tmp_path / "idx_micro"))
    before = band_files(idx.path)
    dedup_index_append(idx, batch)
    delta_micro = {
        b: n - before[b] for b, n in band_files(idx.path).items()
    }
    assert all(n <= 1 for n in delta_micro.values()), delta_micro

    # "corpus-sized" append (ceiling patched to 1 byte): the collapse is
    # bypassed and the band write keeps the 8-partition input
    # parallelism — more than one file may land per band partition
    old = tables.APPEND_COLLAPSE_MAX_BYTES
    tables.APPEND_COLLAPSE_MAX_BYTES = 1
    try:
        idx2 = build_dedup_index(docs, str(tmp_path / "idx_big"))
        before2 = band_files(idx2.path)
        dedup_index_append(idx2, batch)
        delta_big = {
            b: n - before2[b] for b, n in band_files(idx2.path).items()
        }
    finally:
        tables.APPEND_COLLAPSE_MAX_BYTES = old
    # at 8 input partitions and 8 bands, at least one band partition
    # receives rows from >1 task — parallelism was preserved
    assert max(delta_big.values()) > 1, delta_big
    # and the two layouts hold identical rows either way
    from vector_db_example_spark.index.dedupidx import _read_bands

    rows_micro = sorted(map(tuple, _read_bands(spark, idx).collect()))
    rows_big = sorted(map(tuple, _read_bands(spark, idx2).collect()))
    assert rows_micro == rows_big


def test_narrow_materialized_rows_and_width(spark):
    """Round-16 post-checkpoint narrow (sources/tables.py): rows are
    untouched, micro-batch checkpoints coalesce to a row-count-derived
    width, and corpus-sized frames keep every partition (the
    scale-adaptive contract — never a local[32] constant)."""
    from vector_db_example_spark.sources.tables import (
        NARROW_ROWS_PER_PART,
        narrow_materialized,
    )

    ckpt = spark.range(0, 1000, 1, 32).localCheckpoint(eager=True)
    narrowed = narrow_materialized(ckpt, 1000)
    assert narrowed.rdd.getNumPartitions() == 1
    assert sorted(r["id"] for r in narrowed.collect()) == list(range(1000))

    # two target partitions' worth of rows -> width 2
    n2 = 2 * NARROW_ROWS_PER_PART
    ckpt2 = spark.range(0, n2, 1, 32).localCheckpoint(eager=True)
    assert narrow_materialized(ckpt2, n2).rdd.getNumPartitions() == 2

    # "corpus-sized" count: never widen, never shrink below current
    ckpt3 = spark.range(0, 64, 1, 4).localCheckpoint(eager=True)
    assert (
        narrow_materialized(ckpt3, 10_000_000).rdd.getNumPartitions() == 4
    )
