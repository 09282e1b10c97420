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
(1-based). Strings shorter than K+1 stay in the segment index (they
emit length-1 segments) but the PROBE side clamps the enumerated
reference length at max(len(s)-K, K+1), so such references are
unreachable through blocking. The operator therefore handles the
short-string residue internally (r7 ADVICE fix): any pair with
min(length) <= K has both lengths <= 2K, so the residue candidates
come from a length-keyed hash equi-join between strings of length
<= K (reference role) and strings of length <= 2K (probe role) —
still no similarity predicate in a join condition, and the residue
tables are empty for corpora whose strings all exceed K chars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def editdist_self_join(
    df: DataFrame, id_col: str, text_col: str, k: int = 2
) -> DataFrame:
    """All unordered pairs (a, b) with levenshtein(a, b) <= k.

    Returns columns: a_id, b_id, a_text, b_text, dist (a_id < b_id).

    Runs PassJoin over DISTINCT texts, then expands back to id pairs:
    real corpora repeat values heavily (part names here repeat ~20x at
    sf0.1), and a pair of duplicate groups of sizes (g1, g2) would
    otherwise pay g1*g2 levenshtein verifications for what is ONE
    distinct comparison. After the collapse, verification cost is
    O(candidate distinct-name pairs); the id expansion is two hash
    equi-joins on the text key plus the within-group (dist=0) pairs —
    output-proportional fan-out, no per-pair string work. Measured at
    sf0.1: 5.5M output pairs from ~53k distinct-pair verifications.

    Plan shape of the PassJoin core: segment index = one narrow explode
    (K+1 rows/string); probe index = one narrow explode ((2K+1)^2-ish
    slots/string, deduplicated); ONE hash equi-join on (length, segment,
    text); exact verification on candidates only. Both sides shuffle
    short substrings keyed by text — never the corpus cross product.
    """
    kk = k + 1
    ids = df.select(F.col(id_col).alias("gid"), F.col(text_col).alias("gtext"))
    # one representative row per distinct text; min id = deterministic name
    uniq = ids.groupBy("gtext").agg(F.min("gid").alias("uid"))
    s = uniq.select(
        F.col("uid").alias("sid"),
        F.col("gtext").alias("stext"),
        F.length("gtext").alias("slen"),
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
    refs = s.filter(F.col("slen") >= kk).select(
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
    # verified DISTINCT-name pairs, one row per unordered text pair.
    # Restricted to pairs with BOTH lengths >= K+1: such pairs are
    # discovered in both probe directions (each side's length falls in
    # the other's clamped [len-K, len+K] probe range), so sid < rid
    # keeps exactly one orientation.
    name_pairs = (
        cand.join(s, "sid")
        .filter(F.col("slen") >= kk)
        .filter(F.levenshtein(F.col("stext"), F.col("rtext")) <= k)
        .filter(F.col("sid") < F.col("rid"))  # dedup the two directions
        .select(
            F.col("stext").alias("na"),
            F.col("rtext").alias("nb"),
            F.levenshtein(F.col("stext"), F.col("rtext")).alias("dist"),
        )
        .distinct()
    )
    # ---- short-string residue: pairs with min(length) <= K ----
    # Unreachable through segment blocking (probe lengths are clamped at
    # K+1), but bounded by construction: ed <= K forces the partner's
    # length <= 2K. Candidates via a LENGTH hash equi-join (short
    # strings in the reference role x <=2K strings in the probe role);
    # only one orientation is guaranteed discovered (the probe->short
    # direction), so pairs normalize by uid ordering, then distinct.
    refs_short = s.filter(F.col("slen") <= k).select(
        F.col("sid").alias("rid"),
        F.col("stext").alias("rtext"),
        F.col("slen").alias("rlen"),
    )
    probe_lens = s.filter(F.col("slen") <= 2 * k).select(
        "sid",
        "stext",
        F.explode(
            F.expr(f"sequence(greatest(slen - {k}, 0), slen + {k})")
        ).alias("rlen"),
    )
    resid_pairs = (
        probe_lens.join(refs_short, "rlen")
        .filter(F.col("sid") != F.col("rid"))
        .filter(F.levenshtein(F.col("stext"), F.col("rtext")) <= k)
        .select(
            F.when(F.col("sid") < F.col("rid"), F.col("stext"))
            .otherwise(F.col("rtext"))
            .alias("na"),
            F.when(F.col("sid") < F.col("rid"), F.col("rtext"))
            .otherwise(F.col("stext"))
            .alias("nb"),
            F.levenshtein(F.col("stext"), F.col("rtext")).alias("dist"),
        )
        .distinct()
    )
    name_pairs = name_pairs.unionByName(resid_pairs)
    # expand name pairs back to id pairs (pure hash-join fan-out): every
    # id with text na pairs with every id with text nb
    a_ids = ids.select(F.col("gid").alias("ga"), F.col("gtext").alias("na"))
    b_ids = ids.select(F.col("gid").alias("gb"), F.col("gtext").alias("nb"))
    cross = (
        name_pairs.join(a_ids, "na")
        .join(b_ids, "nb")
        .select(
            F.least("ga", "gb").alias("a_id"),
            F.greatest("ga", "gb").alias("b_id"),
            F.when(F.col("ga") < F.col("gb"), F.col("na"))
            .otherwise(F.col("nb"))
            .alias("a_text"),
            F.when(F.col("ga") < F.col("gb"), F.col("nb"))
            .otherwise(F.col("na"))
            .alias("b_text"),
            "dist",
        )
    )
    # identical-text pairs (dist 0): within-group combinations
    same = (
        ids.join(
            ids.select(
                F.col("gid").alias("gid2"), F.col("gtext").alias("gtext2")
            ),
            (F.col("gtext") == F.col("gtext2"))
            & (F.col("gid") < F.col("gid2")),
        )
        .select(
            F.col("gid").alias("a_id"),
            F.col("gid2").alias("b_id"),
            F.col("gtext").alias("a_text"),
            F.col("gtext2").alias("b_text"),
            F.lit(0).cast("int").alias("dist"),
        )
    )
    return cross.unionByName(same)
