"""Unicode differential probe: the full oracle sweep on a NON-ASCII corpus.

The fixtures are pure ASCII, so the DuckDB differential never exercises
cross-engine unicode semantics — length() vs octet_length(), character
vs byte slicing, round() on values that only become irrational once
punctuation counts are nonzero. This harness rebuilds the documents
table with deterministic unicode-bearing texts (accents, cyrillic, CJK,
emoji, NBSP-joined pairs, RTL scripts, full-width forms, combining
marks) and runs scripts/driver_sim.py — every registry query against
its oracle — on the rewritten corpus.

First run (round 10) found three real divergences, all fixed:
* text_quality_score / data_quality_select — Spark BigDecimal HALF_UP
  vs DuckDB std::round(x*1e6) disagreeing by one micro on exact .5e-6
  boundaries (the score's /4 average lands on them whenever the term
  micro-sum is ≡ 2 mod 4; latent on ASCII where punct counts are 0).
  Fixed by exact bigint micro-unit arithmetic on both sides.
* multimodal_frame_sample — the oracle sliced CHARACTERS while the
  codec slices BYTES; 333 vs 299 frames the moment chars != bytes.
  Fixed by hex-level byte slicing + md5-of-hex fingerprints.

Known boundary (documented, not probed): Java regex ``\\s`` includes
U+000B (vertical tab) while DuckDB/RE2's does not, so a text containing
VT would tokenize differently across engines. Neither the fixtures nor
this probe's pool contain VT; a corpus contract that matters at ingest
time, not in the engines.

Usage: python scripts/unicode_probe.py [sf_dir]   (default sf0.001)
Exit:  driver_sim's exit code (0 = every query oracle-matched).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

#: deterministic unicode word pool: accents, cyrillic, CJK, emoji,
#: NBSP-joined pair ("a b"), combining mark, RTL, full-width forms,
#: final-sigma casing trap, german sharp-s casing trap
POOL = [
    "café", "naïve", "Müller", "STRASSE", "straße", "Привет", "мир",
    "数据", "分析", "東京", "🚀", "héllo🌍", "a b", "éclair",
    "שלום", "مرحبا", "１２３", "Ｓｐａｒｋ", "ΣΙΓΜΑ", "σίγμα",
    "éclair",
]


def build_corpus(src: str, dest: str) -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dest, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{src}/{t}.parquet", f"{dest}/{t}.parquet")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{src}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    out = []
    for doc_id, text, lang, source in rows:
        words = text.split(" ")
        for i in range(0, len(words), 5):  # every 5th word goes unicode
            words[i] = POOL[(doc_id + i) % len(POOL)]
        t2 = " ".join(words)
        out.append((doc_id, t2, lang, source, len(t2)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in out], pa.int64()),
                "text": pa.array([r[1] for r in out], pa.string()),
                "lang": pa.array([r[2] for r in out], pa.string()),
                "source": pa.array([r[3] for r in out], pa.string()),
                "n_chars": pa.array([r[4] for r in out], pa.int64()),
            }
        ),
        f"{dest}/documents.parquet",
    )


def main() -> None:
    dest = tempfile.mkdtemp(prefix="unicode_sf_")
    build_corpus(SRC, dest)
    print(f"unicode corpus at {dest}; running driver_sim ...", flush=True)
    rc = subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__), "driver_sim.py"), dest]
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
