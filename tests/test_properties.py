"""Property-based checks (hypothesis) for the semantics flagged risky in
SURVEY.md §7.4: last-writer-wins encoder compilation, the sed cleanse, and
the keyed split. Each property drives one Spark job over a generated batch
and compares against an independent Python emulation of the reference."""

from __future__ import annotations

import re

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clinical_bi_spark.functions.exprs import cleanse_text, encode_last_writer_wins

# Depth tier (r17): python-twin / property sweeps — the fast tier's
# oracle parity adjudicates the default paths end to end; run this
# module with `-m slow` (or `-m ""`), done in full before each round
# closes.
pytestmark = pytest.mark.slow

from clinical_bi_spark.operators.split import keyed_hash_split

ALLOC = st.sampled_from(["Randomized", "Non-Randomized", "N/A", None])
DESC = st.sampled_from(
    [
        "a randomized trial",
        "a non-randomized study",
        "randomized then non-randomized",
        "observational",
        "",
    ]
)
ARMS = st.sampled_from([0, 1, 2, 3])

_slow_ok = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _pandas_allocation(df: pd.DataFrame) -> pd.Series:
    """Independent emulation of ct_data.py:127-131 (.loc overwrite order)."""
    out = pd.Series(0, index=df.index)
    out[df.allocation == "Randomized"] = 1
    out[df.description.str.contains("randomized", regex=False)] = 1
    out[df.allocation == "Non-Randomized"] = 2
    out[df.description.str.contains("non-randomized", regex=False)] = 2
    out[df.arms == 1] = 2
    return out


@_slow_ok
@given(st.lists(st.tuples(ALLOC, DESC, ARMS), min_size=1, max_size=60))
def test_encoder_matches_pandas_loc_semantics(spark, rows):
    pdf = pd.DataFrame(rows, columns=["allocation", "description", "arms"])
    expected = _pandas_allocation(pdf).tolist()
    sdf = spark.createDataFrame(
        [(i, a, d, n) for i, (a, d, n) in enumerate(rows)],
        "idx int, allocation string, description string, arms int",
    )
    rules = [
        (F.col("allocation") == "Randomized", 1),
        (F.col("description").contains("randomized"), 1),
        (F.col("allocation") == "Non-Randomized", 2),
        (F.col("description").contains("non-randomized"), 2),
        (F.col("arms") == 1, 2),
    ]
    got = [
        r.code
        for r in sdf.select(
            "idx", encode_last_writer_wins(rules, 0).cast("int").alias("code")
        )
        .orderBy("idx")
        .collect()
    ]
    assert got == expected


TEXT = st.text(
    alphabet=st.sampled_from(list('abc |"xyz-_.')), min_size=0, max_size=40
)


def _sed_cleanse(s: str) -> str:
    """Independent emulation of db2wh-etl.sh:158-159 (global sed passes)."""
    s = s.replace('"', "'")
    return re.sub(r" \| ", " - ", s)


@_slow_ok
@given(st.lists(TEXT, min_size=1, max_size=60))
def test_cleanse_matches_sed(spark, texts):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "idx int, t string"
    )
    got = [
        r.c
        for r in sdf.select("idx", cleanse_text(F.col("t")).alias("c"))
        .orderBy("idx")
        .collect()
    ]
    assert got == [_sed_cleanse(t) for t in texts]


@pytest.mark.parametrize("n", [100, 1777])
def test_keyed_split_fraction_bounds(spark, n):
    df = spark.range(n).withColumnRenamed("id", "k")
    counts = {
        r.split: r.n
        for r in keyed_hash_split(df, "k")
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(counts.values())
    assert total == n
    # keyed hash approximates the fractions; loose bounds, no flakiness
    assert 0.6 <= counts.get("train", 0) / total <= 0.8
    assert counts.get("validate", 0) / total <= 0.02


def _py_winnow(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Independent pure-Python winnowing (MOSS): normalize, base-31
    polynomial k-gram hashes, sliding-window minima, distinct sorted."""
    s = re.sub(r"[^a-z0-9]", "", text.lower())
    m = len(s) - (k - 1)
    if m < 1:
        return []
    hashes = [
        sum(ord(s[i + j]) * 31 ** (k - 1 - j) for j in range(k)) for i in range(m)
    ]
    n_windows = max(m - window + 1, 1)
    wins = {min(hashes[i : i + window]) for i in range(n_windows)}
    return sorted(wins)


TEXTS = st.text(
    alphabet=st.characters(
        codec="ascii", categories=("L", "N", "P", "Z")
    ),
    max_size=120,
)


@_slow_ok
@given(st.lists(TEXTS, min_size=1, max_size=30))
def test_winnow_matches_python_reference(spark, texts):
    from clinical_bi_spark.operators.dedup import winnow_fingerprints_df

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.id: list(r.fps) for r in winnow_fingerprints_df(df).collect()}
    for i, text in enumerate(texts):
        assert got[i] == _py_winnow(text), (i, text)


# ---------------------------------------------------------------------------
# Codec roundtrip properties (pure Python, no Spark session needed):
# decode(encode(x)) == x for arbitrary shapes/values — the invariant that
# makes the real PPM/BMP/WAV paths safe on arbitrary pipeline data.
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=23),
    st.integers(min_value=1, max_value=23),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    import numpy as np

    from clinical_bi_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.RandomState(seed % (2**32 - 1) or 1)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()


@given(
    st.integers(min_value=1, max_value=23),
    st.integers(min_value=1, max_value=23),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_ppm_roundtrip_property(h, w, seed):
    import numpy as np

    from clinical_bi_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.RandomState(seed % (2**32 - 1) or 1)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=64
    ),
    st.integers(min_value=1, max_value=4),
    st.sampled_from([8000, 16000, 44100, 48000]),
)
def test_wav_roundtrip_property(flat, n_channels, rate):
    import struct as _s

    import numpy as np

    from clinical_bi_spark.operators.multimodal import decode_wav_pcm16

    n = len(flat) - len(flat) % n_channels
    samples = np.array(flat[:n], dtype="<i2").reshape(-1, n_channels)
    fmt = b"fmt " + _s.pack("<I", 16) + _s.pack(
        "<HHIIHH", 1, n_channels, rate, rate * 2 * n_channels, 2 * n_channels, 16
    )
    wav = (
        b"RIFF" + _s.pack("<I", 0) + b"WAVE" + fmt
        + b"data" + _s.pack("<I", samples.nbytes) + samples.tobytes()
    )
    out, got_rate = decode_wav_pcm16(wav)
    assert got_rate == rate and out.shape == samples.shape
    assert (out == samples).all()


# ---------------------------------------------------------------------------
# Portable-hash differential: the md5-u32 MinHash chain (token hash →
# 3-gram polynomial fold → per-permutation minima) against an independent
# pure-Python twin, beyond the fixture corpus. ASCII domain on purpose:
# the engine-portability contract is over md5 of UTF-8 BYTES (unicode-
# safe), but the full pipelines also lower() and \s+-split, whose unicode
# semantics differ by engine — the fixtures are verified pure-ASCII, and
# the oracle docstrings state the caveat.
# ---------------------------------------------------------------------------

ASCII_TEXT = st.text(
    st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)


def _py_minhash(text: str, num_perm: int = 8, seed: int = 42) -> list[int]:
    import hashlib

    from clinical_bi_spark.operators.dedup import _MERSENNE_P, _hash_params

    toks = [t for t in re.split(r"\s+", text.lower()) if t != ""]
    hs = [
        int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % _MERSENNE_P
        for t in toks
    ]
    grams = {
        ((hs[i] * 31 + hs[i + 1]) % _MERSENNE_P * 31 + hs[i + 2]) % _MERSENNE_P
        for i in range(len(hs) - 2)
    }
    if not grams:
        return None
    return [
        min((g * a + b) % _MERSENNE_P for g in grams)
        for a, b in _hash_params(num_perm, seed)
    ]


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(ASCII_TEXT, min_size=1, max_size=8))
def test_minhash_signatures_match_python_twin(spark, texts):
    from clinical_bi_spark.operators.dedup import minhash_signatures_df

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.id: list(r.sig)
        for r in minhash_signatures_df(df, num_perm=8).collect()
    }
    for i, t in enumerate(texts):
        expect = _py_minhash(t, num_perm=8)
        assert got.get(i) == expect, (i, t)


def _py_span_fps(text: str, n: int = 8) -> tuple[list[int], list[int]]:
    """Pure-Python twin of span_fingerprint_arrays: md5-u32 token hashes
    (offsets 1 and 9 → hex slices [0:8] and [8:16]) folded base-31/37."""
    import hashlib

    from clinical_bi_spark.operators.dedup import _MERSENNE_P

    toks = [t for t in re.split(r"\s+", text.lower()) if t != ""]

    def fold(sl, base):
        hs = [
            int(hashlib.md5(t.encode()).hexdigest()[sl], 16) % _MERSENNE_P
            for t in toks
        ]
        out = []
        for i in range(len(hs) - n + 1):
            acc = hs[i]
            for j in range(1, n):
                acc = (acc * base + hs[i + j]) % _MERSENNE_P
            out.append(acc)
        return out

    return fold(slice(0, 8), 31), fold(slice(8, 16), 37)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(ASCII_TEXT, min_size=1, max_size=6))
def test_span_fingerprints_match_python_twin(spark, texts):
    from clinical_bi_spark.operators.dedup import span_fingerprint_arrays

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    f1s, f2s = span_fingerprint_arrays(F.col("text"), 8)
    got = {
        r["doc_id"]: (list(r["a"]), list(r["b"]))
        for r in df.select("doc_id", f1s.alias("a"), f2s.alias("b")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_span_fps(t, 8), (i, t)


@given(
    st.integers(min_value=1, max_value=23),
    st.integers(min_value=1, max_value=23),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_property(h, w, seed):
    """Real zlib PNG: encode (cycling Sub/Up/Average/Paeth row filters) →
    decode (inflate + inverse of all five filters) must be pixel-exact
    for arbitrary images — heights >= 5 force every filter type through
    both directions."""
    import numpy as np

    from clinical_bi_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(seed % (2**32 - 1) or 1)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def test_png_decode_each_filter_type_independently():
    """Hand-build a PNG whose rows use ONE filter type each (including
    None, which the cycling encoder never emits) and check the decoder's
    inverse against a reference unfiltering."""
    import struct
    import zlib

    import numpy as np

    from clinical_bi_spark.operators.multimodal import _PNG_SIG, decode_png

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (5, 4, 3), dtype=np.uint8)
    stride = 4 * 3
    # filter each row with type = row index (0..4), reference-style
    prev = np.zeros(stride, dtype=np.int32)
    pieces = []
    for y in range(5):
        cur = img[y].reshape(stride).astype(np.int32)
        enc = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            left = int(cur[i - 3]) if i >= 3 else 0
            up = int(prev[i])
            ul = int(prev[i - 3]) if i >= 3 else 0
            if y == 0:
                enc[i] = cur[i]
            elif y == 1:
                enc[i] = (cur[i] - left) & 0xFF
            elif y == 2:
                enc[i] = (cur[i] - up) & 0xFF
            elif y == 3:
                enc[i] = (cur[i] - (left + up) // 2) & 0xFF
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                enc[i] = (cur[i] - pred) & 0xFF
        pieces.append(bytes([y]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(pieces)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img).all()


# ---------------------------------------------------------------------------
# Dual-path env-flag registry (r8): the process-global flags and their
# invariant — DRIVER ADJUDICATION ALWAYS RUNS THE EXACT PATH — documented
# in README.md and pinned here. Behavior differentials live next to the
# operators (tests/test_similarity.py exact-arith parity incl. bench SF;
# tests/test_streaming.py eviction path selection + state-fall asserts).
# ---------------------------------------------------------------------------


def test_dual_path_flag_defaults(monkeypatch):
    """Both dual-path flags must DEFAULT to the exact adjudication path
    in an unconfigured process (what the grading driver runs), and flip
    with the env var."""
    from clinical_bi_spark.queries.vectorops import _exact_arith_enabled
    from clinical_bi_spark.streaming.stateful import (
        STATE_EVICTION_ENV,
        _eviction_enabled,
    )

    monkeypatch.delenv("CLINICAL_BI_EXACT_ARITH", raising=False)
    monkeypatch.delenv(STATE_EVICTION_ENV, raising=False)
    assert _exact_arith_enabled() is True, (
        "driver default must be the exact-arithmetic path"
    )
    assert _eviction_enabled(None) is False, (
        "driver default must be the non-evicting exact path"
    )
    monkeypatch.setenv("CLINICAL_BI_EXACT_ARITH", "0")
    monkeypatch.setenv(STATE_EVICTION_ENV, "1")
    assert _exact_arith_enabled() is False
    assert _eviction_enabled(None) is True
    # explicit argument beats the env flag (operator-level override)
    assert _eviction_enabled(False) is False


def test_dual_path_flags_documented_in_readme():
    """The flags are process-global; README.md is their single
    documentation point (r7 verdict #7) — both names and the
    adjudication invariant must appear there."""
    import os

    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md")
    ).read()
    assert "CLINICAL_BI_EXACT_ARITH" in readme
    assert "CLINICAL_BI_STATE_EVICTION" in readme


# ---------------------------------------------------------------------------
# Stateful-operator transition properties (r8): drive the raw
# applyInPandasWithState update functions with ADVERSARIAL chunk splits
# and batch slicings — the shuffle-fetch nondeterminism the r7 ADVICE
# flagged — and require batch-invariant results against a plain-pandas
# reference. No SparkSession needed: the transition fns are pure.
# ---------------------------------------------------------------------------


class _FakeState:
    """Minimal GroupState stand-in for driving transition fns directly."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True

    def remove(self):
        self._v, self.exists = None, False


@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(0, 100, width=32)),
        min_size=1,
        max_size=40,
    ),
    cuts=st.lists(st.integers(1, 39), max_size=4),
    chunk_rev=st.booleans(),
)
def test_ffill_update_batch_and_chunk_invariant(vals, cuts, chunk_rev):
    """The streaming LOCF transition must equal pandas ffill over the
    whole sequence REGARDLESS of (a) how the sequence splits into
    micro-batches and (b) the arrival order of chunks within a batch
    (the fn must concat+sort before filling)."""
    from clinical_bi_spark.streaming.stateful import _make_ffill_update

    n = len(vals)
    ts = pd.to_datetime(range(n), unit="s")
    full = pd.DataFrame(
        {"event_id": range(n), "ts": ts, "value_obs": pd.array(vals, dtype="float64")}
    )
    expected = full["value_obs"].ffill().tolist()

    bounds = sorted({0, n, *[c for c in cuts if c < n]})
    update = _make_ffill_update(evict=False)
    state = _FakeState()
    got: dict[int, float] = {}
    for a, b in zip(bounds[:-1], bounds[1:]):
        batch = full.iloc[a:b]
        mid = len(batch) // 2
        chunks = [batch.iloc[:mid], batch.iloc[mid:]]
        if chunk_rev:
            chunks = chunks[::-1]  # adversarial chunk arrival order
        for out in update((7,), iter(chunks), state):
            for r in out.itertuples(index=False):
                got[int(r.event_id)] = r.value_ff
    assert len(got) == n
    for i, exp in enumerate(expected):
        g = got[i]
        if pd.isna(exp):
            assert pd.isna(g), (i, g, exp)
        else:
            assert g == exp, (i, g, exp)


@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    types=st.lists(
        st.sampled_from(["view", "click", "purchase", "error"]),
        min_size=1,
        max_size=60,
    ),
    cuts=st.lists(st.integers(1, 59), max_size=5),
)
def test_cep_update_batch_slicing_invariant(types, cuts):
    """The streaming CEP transition's FINAL deduped match table (latest
    snapshot per match_start) must be identical however the event
    sequence slices into micro-batches — matches that span batch
    boundaries stitch through the island state."""
    from clinical_bi_spark.queries.events import (
        CEP_DEFAULT_NAMES,
        CEP_DEFAULT_PATTERN,
    )
    from clinical_bi_spark.streaming.stateful import make_cep_update

    n = len(types)
    ts = pd.to_datetime(range(n), unit="s")

    def run(bounds) -> dict:
        update = make_cep_update(CEP_DEFAULT_PATTERN, CEP_DEFAULT_NAMES, False)
        state = _FakeState()
        final: dict = {}
        for a, b in zip(bounds[:-1], bounds[1:]):
            pdf = pd.DataFrame(
                {
                    "event_id": range(a, b),
                    "ts": ts[a:b],
                    "event_type": types[a:b],
                }
            )
            for out in update((1,), iter([pdf]), state):
                for r in out.itertuples(index=False):
                    final[r.match_start_ns] = tuple(r)[1:]
        return final

    single = run([0, n])
    sliced = run(sorted({0, n, *[c for c in cuts if c < n]}))
    assert single == sliced


# ---------------------------------------------------------------------------
# Sharded prefix sums (operators/ranking.py): hypothesis-random relations —
# random values incl. NULLs, random (possibly NULL) group keys, random shard
# counts — must match SUM() OVER (PARTITION BY g ORDER BY o) exactly. The
# deterministic boundary cases live in test_analytics.py; this is the
# adversarial-random sweep.
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # group
            st.integers(min_value=-5, max_value=5),                   # order
            st.one_of(st.none(), st.integers(-1000, 1000)),           # value
        ),
        min_size=0,
        max_size=60,
    ),
    n_parts=st.integers(min_value=1, max_value=7),
)
def test_global_prefix_sums_random_matches_window(spark, rows, n_parts):
    from pyspark.sql.window import Window

    from clinical_bi_spark.operators.ranking import global_prefix_sums

    # disambiguate the order within (g, o) ties with a unique id so both
    # forms share one total order
    data = [(g, o, i, v) for i, (g, o, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "g string, o int, tie long, v long"
    )
    got = {
        (r.g, r.o, r.tie): r.kv
        for r in global_prefix_sums(
            df, [F.col("o"), F.col("tie")], ["v"], ["kv"],
            partition_by=["g"], n_partitions=n_parts,
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("o", "tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r.g, r.o, r.tie): r.kv
        for r in df.select(
            "g", "o", "tie",
            F.sum(F.coalesce("v", F.lit(0))).over(w).alias("kv"),
        ).collect()
    }
    assert got == want


_FUZZ_TEXT = st.one_of(
    st.none(),
    st.text(max_size=200),  # full unicode, incl. surrogate-adjacent cases
    st.text(
        alphabet=st.sampled_from(
            list("the and of to in is it that for a el la de que y "
                 "der die und das . , ! ? ; 中 文 😀   \t \n é ß")
        ),
        max_size=300,
    ),
)


@_slow_ok
@given(st.lists(_FUZZ_TEXT, min_size=1, max_size=40))
def test_bound_quality_and_gate_match_unbound_forms(spark, texts):
    """Hypothesis fuzz over arbitrary unicode for the r11 let-binding
    rewrite: the bound quality_score_micro and the fused curation gate
    must equal the unfused public forms on ANY input, not just the
    probe corpus (tests/test_text_binding.py pins the fixed corpora;
    this pins the long tail)."""
    from clinical_bi_spark.functions.text import (
        curation_keep,
        language_guess,
        quality_score,
        quality_score_micro,
    )

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        quality_score_micro(F.col("text")).alias("qm"),
        (quality_score(F.col("text")) * 1_000_000).alias("q6"),
        curation_keep(F.col("text")).alias("fused"),
        (
            (quality_score(F.col("text")) >= 0.85)
            & (language_guess(F.col("text")) == "en")
        ).alias("unfused"),
    ).collect()
    for r in rows:
        if r.qm is None:
            assert r.q6 is None
        else:
            assert r.qm == round(r.q6), (r.qm, r.q6)
        assert bool(r.fused) == bool(r.unfused), (r.fused, r.unfused)


# ---------------------------------------------------------------------------
# Registered r14 (parked r13): gapfill + TWA vs pure-Python big-int references
# on hypothesis-random event sets (ties, duplicate timestamps, single-
# event users, arbitrary gaps) — the property form of the hand fixtures.
# ---------------------------------------------------------------------------

_EVT = st.tuples(
    st.integers(min_value=1, max_value=4),          # user_id
    st.integers(min_value=0, max_value=40),         # day offset
    st.integers(min_value=0, max_value=86_399_999_999),  # intra-day micros
    st.integers(min_value=0, max_value=99_999),     # value in cents
)


def _write_events(spark, tmp_path, evs):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(days=d, microseconds=us),
            u,
            "view",
            c / 100.0,
            "{}",
        )
        for i, (u, d, us, c) in enumerate(evs)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


@_slow_ok
@given(st.lists(_EVT, min_size=1, max_size=40))
def test_gapfill_matches_bigint_reference(spark, tmp_path_factory, evs):
    from clinical_bi_spark.queries.events import evt_gapfill_interpolate

    tmp = tmp_path_factory.mktemp("gapfill_prop")
    _write_events(spark, tmp, evs)
    got = {
        (r.user_id, str(r.bucket_date)): (r.value_micro, r.src)
        for r in evt_gapfill_interpolate(spark, str(tmp)).collect()
    }

    import datetime

    base = datetime.date(2024, 1, 1)
    byday: dict = {}
    for u, d, _us, c in evs:
        s, n = byday.get((u, d), (0, 0))
        byday[(u, d)] = (s + c, n + 1)
    ref: dict = {}
    for (u, d), (s, n) in byday.items():
        ref[(u, str(base + datetime.timedelta(days=d)))] = (
            (10000 * s) // n,
            "observed",
        )
    for u in {u for u, *_ in evs}:
        days = sorted(d for (uu, d) in byday if uu == u)
        for a, b in zip(days, days[1:]):
            if b - a > 1:
                s1, c1 = byday[(u, a)]
                s2, c2 = byday[(u, b)]
                for t in range(a + 1, b):
                    v = (
                        10000 * (s1 * c2 * (b - t) + s2 * c1 * (t - a))
                    ) // (c1 * c2 * (b - a))
                    ref[(u, str(base + datetime.timedelta(days=t)))] = (
                        v,
                        "interpolated",
                    )
    assert got == ref


@_slow_ok
@given(st.lists(_EVT, min_size=1, max_size=40))
def test_twa_matches_bigint_reference(spark, tmp_path_factory, evs):
    from clinical_bi_spark.queries.events import (
        evt_time_weighted_avg,
        evt_time_weighted_avg_sharded,
    )

    tmp = tmp_path_factory.mktemp("twa_prop")
    _write_events(spark, tmp, evs)
    got = {
        r.user_id: (r.n_events, r.twa_micro)
        for r in evt_time_weighted_avg(spark, str(tmp)).collect()
    }
    sharded = {
        r.user_id: (r.n_events, r.twa_micro)
        for r in evt_time_weighted_avg_sharded(spark, str(tmp)).collect()
    }
    assert sharded == got  # the skew twin under arbitrary inputs

    peru: dict = {}
    for i, (u, d, us, c) in enumerate(evs):
        peru.setdefault(u, []).append((d * 86_400_000_000 + us, i, c))
    ref: dict = {}
    for u, pts in peru.items():
        pts.sort()  # (us, event_id) total order — the query's tie-break
        span = pts[-1][0] - pts[0][0]
        if span == 0:
            ref[u] = (len(pts), None)
            continue
        num = sum(
            c * (pts[i + 1][0] - pts[i][0])
            for i, (_, _, c) in enumerate(pts[:-1])
        )
        ref[u] = (
            len(pts),
            10000 * (num // span) + (10000 * (num % span)) // span,
        )
    assert got == ref


@_slow_ok
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_bpe_matches_reference_on_random_corpora(
    spark, tmp_path_factory, word_lists
):
    """The parked r15 BPE candidate vs the canonical Python reference on
    hypothesis-random corpora over a tiny alphabet (maximizing merge
    collisions, tie-breaks, and pair-exhaustion no-op rounds — the
    regimes where greedy-leftmost semantics can diverge)."""
    from clinical_bi_spark.queries.textops import _BPE_MERGES
    from tests.test_textops import _ref_bpe_counts, _run_bpe

    texts = [" ".join(ws) for ws in word_lists]
    tmp = tmp_path_factory.mktemp("bpe_prop")
    got = _run_bpe(spark, tmp, texts)
    assert got == _ref_bpe_counts(texts, _BPE_MERGES)


# ---------------------------------------------------------------------------
# Parked r17 candidates: compaction plan + Adamic-Adar vs pure-Python
# references on hypothesis-random inputs — the property form of the hand
# fixtures in test_pipelineops_dsir.py / test_analytics.py.
# ---------------------------------------------------------------------------


@_slow_ok
@given(
    st.lists(st.integers(min_value=66, max_value=600), min_size=1, max_size=24)
)
def test_compaction_matches_python_reference(spark, tmp_path_factory, sizes):
    """Random per-file byte sizes (one file per consecutive day) → the
    query's bins must equal the textbook ordered packing computed in
    plain Python: bin(file i) = floor(sum(sizes[:i]) / target)."""
    import datetime

    from clinical_bi_spark.queries import pipelineops

    tmp_path = tmp_path_factory.mktemp("compaction_prop")
    base = datetime.date(1995, 1, 1)
    rows = [
        (i + 1, base + datetime.timedelta(days=i), "x" * (s - 65), "F")
        for i, s in enumerate(sizes)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderdate date, o_orderpriority string, "
        "o_orderstatus string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    target = 200
    # pure-Python reference: exclusive prefix // target, rolled up per bin
    ref: dict = {}
    excl = 0
    for i, s in enumerate(sizes):
        b = excl // target
        d = base + datetime.timedelta(days=i)
        n, tot, lo, hi = ref.get(b, (0, 0, d, d))
        ref[b] = (n + 1, tot + s, min(lo, d), max(hi, d))
        excl += s

    orig = pipelineops._COMPACTION_TARGET
    pipelineops._COMPACTION_TARGET = target
    try:
        got = {
            r.bin: (r.n_files, r.total_bytes, r.date_lo, r.date_hi)
            for r in pipelineops.data_compaction_plan(
                spark, str(tmp_path)
            ).collect()
        }
    finally:
        pipelineops._COMPACTION_TARGET = orig
    assert got == ref


_BASKET = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),   # customer
        st.integers(min_value=1, max_value=8),   # part
    ),
    min_size=1,
    max_size=40,
)


@_slow_ok
@given(_BASKET)
def test_adamic_adar_matches_python_reference(spark, tmp_path_factory, pairs):
    """Random small bipartite graphs (duplicate basket rows collapse, deg<2
    customers drop out, the >=_AA_MIN_COMMON floor applies) → the query
    must equal a dict-and-loop Python Adamic-Adar."""
    import itertools
    import math

    from clinical_bi_spark.queries.graph import (
        _AA_BASKET_CAP,
        _AA_MIN_COMMON,
        graph_adamic_adar,
    )

    tmp_path = tmp_path_factory.mktemp("aa_prop")
    baskets: dict = {}
    for c, p in pairs:
        baskets.setdefault(c, set()).add(p)
    orders, lineitem = [], []
    for c, parts in baskets.items():
        orders.append((c * 100, c))
        lineitem.extend((c * 100, p) for p in sorted(parts))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    ref: dict = {}
    for c, parts in baskets.items():
        deg = len(parts)
        if not (2 <= deg <= _AA_BASKET_CAP):
            continue
        term = round(1e9 / math.log(deg))
        for a, b in itertools.combinations(sorted(parts), 2):
            n, s = ref.get((a, b), (0, 0))
            ref[(a, b)] = (n + 1, s + term)
    ref = {k: v for k, v in ref.items() if v[0] >= _AA_MIN_COMMON}

    got = {
        (r.part_a, r.part_b): (r.n_common, r.aa_nano)
        for r in graph_adamic_adar(spark, str(tmp_path)).collect()
    }
    assert got == ref


def test_null_value_columns_do_not_crash(spark, tmp_path_factory):
    """Pin the r16 null-skipping contract per-session, not just at the
    round-end probe: the four queries the nulls regime crashed at birth
    (None inside driver-side int()/division and list(None) into the
    k-means fit — see the null-contract comments at each site) must
    build and count on an all-NULL value corpus. The full-registry
    sweep stays the probe's job (scripts/degenerate_probe.py, regime
    ``nulls``); this covers the fixed sites so a refactor can't silently
    reintroduce the crash class between probe runs."""
    from scripts.degenerate_probe import build_corpus

    d = str(tmp_path_factory.mktemp("nulls_corpus"))
    build_corpus(spark, d, "nulls")

    from clinical_bi_spark.queries.events import evt_changepoint_cusum
    from clinical_bi_spark.queries.textops import text_bm25_topk
    from clinical_bi_spark.queries.vectorops import (
        dedup_semantic_cluster,
        sim_ann_ivf,
    )

    for fn in (text_bm25_topk, sim_ann_ivf, dedup_semantic_cluster,
               evt_changepoint_cusum):
        n = fn(spark, d).count()
        assert n >= 0, fn.__name__
