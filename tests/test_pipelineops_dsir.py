"""DSIR importance-resampling selection (r11 registration candidate:
oracle + behavior pinned now, @query registration happens before the r11
window commit). Also pre-runs the degenerate-corpus probe over BOTH r11
candidates (DSIR + SemDeDup) — once registered they face
scripts/degenerate_probe.py every round, so their crash-free contract is
pinned at birth."""

from __future__ import annotations

import sys
import tempfile

import pytest

from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.fixture(scope="module")
def dsir_rows(spark):
    from clinical_bi_spark.queries.pipelineops import data_dsir_select

    return data_dsir_select(spark, SF_ORACLE).collect()


def test_dsir_matches_oracle(spark, oracle_con):
    from clinical_bi_spark.queries.pipelineops import (
        _DSIR_ORACLE,
        data_dsir_select,
    )

    df = data_dsir_select(spark, SF_ORACLE)
    assert_matches_oracle(df, oracle_con, _DSIR_ORACLE, name="data_dsir_select")


def test_dsir_selects_k_unique_ranked(dsir_rows):
    from clinical_bi_spark.queries.pipelineops import _DSIR_K

    assert len(dsir_rows) == _DSIR_K
    assert len({r.doc_id for r in dsir_rows}) == _DSIR_K
    assert sorted(r.pos for r in dsir_rows) == list(range(1, _DSIR_K + 1))
    # pos order is (key desc, doc_id asc)
    by_pos = sorted(dsir_rows, key=lambda r: r.pos)
    keys = [(-r.key_micro, r.doc_id) for r in by_pos]
    assert keys == sorted(keys)


def test_dsir_favors_target_language(spark, dsir_rows):
    """The method's point: importance weights pull the selection toward
    the target (English) distribution, well above the corpus base rate."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "lang"
    ).collect()
    lang = {r.doc_id: r.lang for r in docs}
    frac_corpus = sum(1 for v in lang.values() if v == "en") / len(lang)
    frac_sel = sum(1 for r in dsir_rows if lang[r.doc_id] == "en") / len(
        dsir_rows
    )
    assert frac_sel > frac_corpus + 0.2, (frac_sel, frac_corpus)


def test_dsir_scored_covers_corpus(spark):
    from clinical_bi_spark.queries.pipelineops import _dsir_scored

    n = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    rows = _dsir_scored(spark, SF_ORACLE).collect()
    assert len(rows) == n
    assert len({r.vec_id if hasattr(r, "vec_id") else r.doc_id for r in rows}) == n
    # en docs carry higher importance weight on average — the signal the
    # Gumbel-top-k then samples from
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "lang"
    ).collect()
    lang = {r.doc_id: r.lang for r in docs}
    en = [r.logw_micro for r in rows if lang[r.doc_id] == "en"]
    other = [r.logw_micro for r in rows if lang[r.doc_id] != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)


@pytest.fixture(scope="module")
def degenerate_dirs(spark):
    sys.path.insert(0, "/root/repo/scripts")
    from degenerate_probe import build_corpus

    base = tempfile.mkdtemp(prefix="cbs_deg_r11cand_")
    dirs = {}
    for probe, mono in (("zeros", False), ("monokey", True)):
        d = f"{base}/{probe}"
        build_corpus(spark, d, mono)
        dirs[probe] = d
    return dirs


def test_r11_candidates_survive_degenerate_corpora(spark, degenerate_dirs):
    """Crash-free on zero-token docs / empty embeddings / single-entity
    corpora — the contract scripts/degenerate_probe.py will enforce once
    these register in r11."""
    from clinical_bi_spark.queries.pipelineops import data_dsir_select
    from clinical_bi_spark.queries.vectorops import dedup_semantic_cluster

    for d in degenerate_dirs.values():
        assert data_dsir_select(spark, d).count() == 64
        assert dedup_semantic_cluster(spark, d).count() == 64
