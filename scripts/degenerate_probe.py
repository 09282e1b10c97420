"""Permanent degenerate-corpus probe (r9 verdict, Next #8: the ad-hoc r9
sweep found ten real ANSI crash-vs-NULL divergences — codify it as a
round-end harness).

Builds four pathological corpora from sf0.001 and runs EVERY registry
query against each, asserting no UNEXPECTED crash (returning zero rows,
NULL statistics, or a DOCUMENTED loud error is fine; an ANSI
DIVIDE_BY_ZERO / INVALID_ARRAY_INDEX / numpy broadcast surprise is a
bug):

* ``zeros``   — every non-key value column constant/zero/empty (empty
  text -> zero-token docs, all-zero embeddings, zero-variance prices,
  one class everywhere); keys and timestamps keep their real values.
* ``monokey`` — additionally collapses entity keys and event time:
  every event from ONE user at ONE timestamp, every order from one
  customer — the single-entity / single-instant regime.
* ``nulls`` (r16) — every non-key value column NULL: 3VL predicates,
  null-skipping aggregates, NULL through split/explode/array kernels
  and None inside pandas_udf numpy paths — a different surface from
  zeros (0 and '' are VALUES; NULL is the absence the r9 sweep's
  crash-vs-NULL divergences were actually about).
* ``megadoc`` (r11) — ONE ~1 MB document / one vector: per-document
  quadratics and single-giant-row paths (token arrays, shingle
  explosions, Arrow batch sizing) the tiny-row corpora never reach.

Env: CBS_PROBE_REGIMES=nulls[,zeros,...] selects regimes (default all).

DOCUMENTED loud errors (intentional data contracts, not bugs):

* sim_ann_pq — raises ValueError on the zero-dim embedding (dim
  validation, r9);
* data_mixture_sample — ANSI cast failure on a malformed (empty)
  source name: the source-number weight map is a data contract, and
  silently null-weighting corrupt names at 100 TB would hide the
  corruption (r9 decision, documented in the window comment).

Usage: python scripts/degenerate_probe.py [out_dir]
Env:   CBS_PROBE_ONLY=name1,name2   (subset; default: full registry)
Exit:  0 iff every query is OK or an expected documented raise.
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clinical_bi_spark import caching
from clinical_bi_spark.queries import load_all
from clinical_bi_spark.session import get_spark

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
#: columns that keep their real values in the `zeros` probe
_KEYISH = ("key", "_id", "linenumber", "ts", "orderdate", "shipdate")
#: query -> error-text substring that is a DOCUMENTED loud contract
EXPECTED_RAISES = {
    "sim_ann_pq": "ValueError",
    "data_mixture_sample": "CAST_INVALID_INPUT",
}


def _mono_constants():
    """Entity/time columns collapsed to one constant value (built lazily:
    F.lit needs an active SparkContext)."""
    return {
        "user_id": F.lit(1).cast("bigint"),
        "o_custkey": F.lit(1).cast("bigint"),
        "ts": F.lit("2024-01-01 00:00:00").cast("timestamp"),
    }


def _degenerate_nulls(df):
    """The fourth regime (r16): every non-key value column NULL. Zeros
    and NULLs are DIFFERENT failure surfaces — zeros exercise the
    arithmetic at a boundary value, NULLs exercise 3VL predicates,
    null-skipping aggregates, NULL propagation through split/explode/
    array kernels, and None handling inside pandas_udf numpy paths,
    none of which the empty-string/zero corpus reaches. Keys and
    timestamps keep their real values (the zeros-probe contract: entity
    identity and event time are key-like; a NULL event time is
    out-of-contract data, not a robustness target)."""
    cols = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if any(f.name.endswith(s) for s in _KEYISH) or t == "timestamp":
            cols.append(F.col(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def _degenerate(df, mono: bool):
    mono_consts = _mono_constants() if mono else {}
    cols = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if mono and f.name in mono_consts:
            cols.append(mono_consts[f.name].alias(f.name))
        elif any(f.name.endswith(s) for s in _KEYISH):
            cols.append(F.col(f.name))  # keys/time keep real values
        elif t == "string":
            cols.append(F.lit("").alias(f.name))
        elif t in ("double", "float"):
            cols.append(F.lit(0.0).cast(t).alias(f.name))
        elif t in ("bigint", "int", "smallint", "tinyint"):
            cols.append(F.lit(0).cast(t).alias(f.name))
        elif t.startswith("array"):
            cols.append(F.expr(f"CAST(array() AS {t})").alias(f.name))
        else:  # non-keyish timestamps/dates: keep
            cols.append(F.col(f.name))
    return df.select(*cols)


def build_corpus(spark, out_dir: str, mono: bool | None) -> None:
    """mono=False -> zeros, mono=True -> monokey, mono="nulls" -> nulls."""
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet").limit(64)
        deg = _degenerate_nulls(df) if mono == "nulls" else _degenerate(df, mono)
        deg.coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )


def _mega_text(n_tokens: int = 150_000) -> str:
    """Deterministic ~1 MB document: varied pseudo-words mixed with real
    stopwords so tokenizers, language ID, and the quality terms all see
    non-degenerate values at a pathological per-document size."""
    words = []
    for i in range(n_tokens):
        if i % 5 == 0:
            words.append(("the", "of", "to", "in", "is")[(i // 5) % 5])
        else:
            words.append(f"w{i % 997}x{i % 31}")
    return " ".join(words)


def build_megadoc_corpus(spark, out_dir: str) -> None:
    """The third regime (r11): ONE giant document / ONE vector — probes
    per-document quadratics and single-giant-row paths (token arrays,
    shingle explosions, Arrow batch sizing) that the zeros/monokey
    corpora (64 tiny rows) can never reach. Non-document tables keep
    their real 64-row slices so joins and event queries stay live."""
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet").limit(64)
        if t == "documents":
            one = df.limit(1).select(
                *[
                    F.lit(_mega_text()).alias(f.name)
                    if f.name == "text"
                    else F.col(f.name)
                    for f in df.schema.fields
                ]
            )
            one.coalesce(1).write.mode("overwrite").parquet(
                f"{out_dir}/{t}.parquet"
            )
        elif t == "embeddings":
            df.limit(1).coalesce(1).write.mode("overwrite").parquet(
                f"{out_dir}/{t}.parquet"
            )
        else:
            df.coalesce(1).write.mode("overwrite").parquet(
                f"{out_dir}/{t}.parquet"
            )


def _parked_candidates() -> dict:
    """Parked (not-yet-registered) r13/r14 candidates get the same probe
    BEFORE their registration round — a crash found here is a crash the
    driver never sees. Keep in sync with the parking comments in
    queries/__init__.py. Streaming candidates are excluded: the probe's
    count() contract doesn't drive a streaming sink (their degenerate
    pins live in tests/test_streaming.py)."""
    from clinical_bi_spark.queries.graph import graph_adamic_adar
    from clinical_bi_spark.queries.pipelineops import data_compaction_plan

    # graduated to the registry and now riding the registered sweep:
    # multimodal_video_mp4_samples (r13), evt_gapfill_interpolate /
    # evt_time_weighted_avg (r14), text_bpe_train_encode /
    # data_zorder_layout (r15), multimodal_audio_resample /
    # multimodal_image_patches (r16)
    return {
        "PARKED:data_compaction_plan": data_compaction_plan,
        "PARKED:graph_adamic_adar": graph_adamic_adar,
    }


def main() -> None:
    spark = get_spark("degenerate-probe")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    parked = _parked_candidates()

    class _Spec:  # minimal shim: the loop only touches .fn
        def __init__(self, fn):
            self.fn = fn

    reg = dict(reg) | {k: _Spec(fn) for k, fn in parked.items()}
    only = os.environ.get("CBS_PROBE_ONLY")
    names = only.split(",") if only else list(reg)
    base = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="cbs_degenerate_"
    )
    failures = []
    regimes = os.environ.get("CBS_PROBE_REGIMES")
    wanted = set(regimes.split(",")) if regimes else None
    for probe, mono in (
        ("zeros", False),
        ("monokey", True),
        ("nulls", "nulls"),
        ("megadoc", None),
    ):
        if wanted is not None and probe not in wanted:
            continue
        d = os.path.join(base, probe)
        if probe == "megadoc":
            build_megadoc_corpus(spark, d)
        else:
            build_corpus(spark, d, mono)
        for name in names:
            try:
                n = reg[name].fn(spark, d).count()
                status = f"OK rows={n}"
            except Exception as exc:  # noqa: BLE001 - the probe's job
                kind = EXPECTED_RAISES.get(name)
                text = f"{type(exc).__name__}: {exc}"
                if kind and kind in text:
                    status = f"EXPECTED-RAISE ({kind})"
                else:
                    status = "FAIL"
                    failures.append((probe, name, text.splitlines()[0][:300]))
                    traceback.print_exc(limit=2, file=sys.stderr)
            finally:
                caching.release_all(spark)
                spark.catalog.clearCache()
            print(f"[{probe}] {name}: {status}", flush=True)
    print(f"\n{len(failures)} unexpected failures", flush=True)
    for probe, name, text in failures:
        print(f"  [{probe}] {name}: {text}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
