"""Edit-distance self-join via segment blocking (PassJoin scheme).

The record-linkage operator Spark lacks natively: find all pairs of
strings within Levenshtein distance K without the O(n^2) cross join.

Blocking theorem (PassJoin, Li et al., VLDB 2012 — public literature):
partition a reference string r into K+1 contiguous segments; if
ed(s, r) <= K then s contains at least one of those segments VERBATIM,
starting within +/-K of its position in r (at most K edits precede any
segment, and each shifts positions by at most one). So candidates are
an EQUI-join between a segment index of all strings and the bounded set
of substrings each string offers at the allowed (length, segment,
position-shift) slots — no similarity predicate ever reaches a join
condition, which keeps the plan a hash join at any corpus size.

The candidate key is (reference_length, segment_index, segment_text):
probes enumerate reference lengths in [len(s)-K, len(s)+K], so length
filtering is built into the key. Verification (exact levenshtein)
runs only on the blocked candidates. Segment-partition convention
(mirrored by any oracle that re-derives it): segment i of a length-L
string has length (L div (K+1)) + 1 extra for the first L mod (K+1)
segments, start position i*(L div (K+1)) + min(i, L mod (K+1)) + 1
(1-based). Strings shorter than K+1 produce empty segments and are
filtered from blocking — callers with such strings should lower K or
brute-force that residue (documented contract; the oracle's all-pairs
form proves the blocking loses no pair for the actual data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def editdist_self_join(
    df: DataFrame, id_col: str, text_col: str, k: int = 2
) -> DataFrame:
    """All unordered pairs (a, b) with levenshtein(a, b) <= k.

    Returns columns: a_id, b_id, a_text, b_text, dist (a_id < b_id).

    Plan shape: segment index = one narrow explode (K+1 rows/string);
    probe index = one narrow explode ((2K+1)^2-ish slots/string,
    deduplicated); ONE hash equi-join on (length, segment, text); exact
    verification on candidates only. Both sides shuffle short substrings
    keyed by text — never the corpus cross product.
    """
    kk = k + 1
    s = df.select(
        F.col(id_col).alias("sid"),
        F.col(text_col).alias("stext"),
        F.length(text_col).alias("slen"),
    )

    # ---- reference side: K+1 segments per string ----
    seg_struct = F.expr(
        f"""
        filter(
          transform(sequence(0, {k}), i -> struct(
            i AS seg_i,
            substring(stext,
                      i * (slen div {kk}) + least(i, slen % {kk}) + 1,
                      (slen div {kk}) + if(i < slen % {kk}, 1, 0)) AS seg,
            CAST((slen div {kk}) + if(i < slen % {kk}, 1, 0) AS INT) AS seg_len
          )),
          x -> x.seg_len >= 1)
        """
    )
    refs = s.select(
        F.col("sid").alias("rid"),
        F.col("stext").alias("rtext"),
        F.col("slen").alias("rlen"),
        F.explode(seg_struct).alias("g"),
    ).select(
        "rid", "rtext", "rlen", F.col("g.seg_i").alias("seg_i"),
        F.col("g.seg").alias("seg"),
    )

    # ---- probe side: substrings at every allowed (L, i, shift) slot ----
    probe_struct = F.expr(
        f"""
        filter(
          flatten(flatten(
            transform(sequence(greatest(slen - {k}, {kk}), slen + {k}), L ->
              transform(sequence(0, {k}), i ->
                transform(sequence(-{k}, {k}), d -> struct(
                  L AS ref_len,
                  i AS seg_i,
                  substring(stext,
                            i * (L div {kk}) + least(i, L % {kk}) + 1 + d,
                            (L div {kk}) + if(i < L % {kk}, 1, 0)) AS seg,
                  CAST((L div {kk}) + if(i < L % {kk}, 1, 0) AS INT)
                    AS seg_len,
                  CAST(i * (L div {kk}) + least(i, L % {kk}) + 1 + d AS INT)
                    AS pos)))))),
          x -> x.seg_len >= 1 AND x.pos >= 1
               AND x.pos + x.seg_len - 1 <= slen)
        """
    )
    probes = (
        s.select("sid", "slen", F.explode(probe_struct).alias("g"))
        .select(
            "sid",
            F.col("g.ref_len").alias("rlen"),
            F.col("g.seg_i").alias("seg_i"),
            F.col("g.seg").alias("seg"),
        )
        .distinct()
    )

    cand = (
        probes.join(refs, ["rlen", "seg_i", "seg"])
        .filter(F.col("sid") != F.col("rid"))
        .select("sid", "rid", "rtext")
        .distinct()
    )
    verified = (
        cand.join(s, "sid")
        .filter(F.levenshtein(F.col("stext"), F.col("rtext")) <= k)
        .select(
            F.least("sid", "rid").alias("a_id"),
            F.greatest("sid", "rid").alias("b_id"),
            F.when(F.col("sid") < F.col("rid"), F.col("stext"))
            .otherwise(F.col("rtext"))
            .alias("a_text"),
            F.when(F.col("sid") < F.col("rid"), F.col("rtext"))
            .otherwise(F.col("stext"))
            .alias("b_text"),
            F.levenshtein(F.col("stext"), F.col("rtext")).alias("dist"),
        )
        .distinct()
    )
    return verified
