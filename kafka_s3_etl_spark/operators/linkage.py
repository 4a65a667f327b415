"""Record linkage: scalable edit-distance-1 similarity self-join.

The entity-resolution primitive a curation pipeline runs over author
names, URLs, or titles: find all pairs of values whose Levenshtein
distance is <= 1 WITHOUT the O(n^2) all-pairs comparison the naive
formulation (and the DuckDB oracle) uses.

Blocking scheme — deletion neighborhoods (the FastSS / SymSpell
construction): every string of length L generates L+1 signatures — the
string itself plus each single-character deletion, tagged with the
deletion position. Two strings are within edit distance 1 iff they
collide on a compatible signature:

* substitution:  del_i(u) == del_i(v)  (same position dropped),
* insert/delete: u == del_i(v) or v == del_i(u),
* equality:      u == v (excluded here; inputs are distinct values).

So candidate generation is a pair of plain equi-joins — deletion
signatures against themselves on (sig, pos) for substitutions, and
identity strings against deletion signatures for inserts/deletes — a
hash-partitioned shuffle of ~L+1 short keys per row, never a cross
join. The position tag makes the blocking EXACT (see
``fuzzy_pairs_ed1``), so there is no verify pass at all. At 100 TB
this is the standard shape: signature blow-up is linear in string
length, the joins shuffle fixed-width keys, and skewed signatures
(e.g. very common short strings) stay bounded because the signature
carries the deletion position.

Reference behavioral anchor: the reference pipeline has no fuzzy
matching; this extends SURVEY.md section 2g's training-data curation
family (near-dup author/source names) with an exact-threshold linkage
operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs_ed1(
    values: DataFrame, col: str = "name", max_block: int | None = None
) -> DataFrame:
    """All unordered pairs (a < b) of DISTINCT values of ``values[col]``
    with Levenshtein distance <= 1.

    Returns (a, b, dist) with dist an INT (always 1: inputs are
    distinct, and both join branches below admit exactly-distance-1
    pairs by construction).

    The position tag makes blocking EXACT (zero false positives — an
    untagged signature join admits distance-2 pairs that share a
    deletion at two different positions; measured 977k candidates for
    262k true pairs at sf0.1):

    * substitution: del_i(u) == del_i(v) at the SAME position i means
      u and v differ at position i and nowhere else — distance exactly
      1. Plain equi-join of deletion signatures on (sig, pos).
    * insert/delete: u == del_i(v) means u IS v minus one character —
      distance exactly 1. Equi-join of identity strings against
      deletion signatures (a run of equal characters matches at every
      deletion position, hence the distinct on this branch only).

    No verify filter is needed; ``levenshtein`` appears only as the
    (cheap, output-sized) dist column so the schema carries the real
    metric. Cost: two hash equi-joins on short string signatures,
    never an all-pairs product.

    ``max_block`` is the bounded-output knob for corpora where a few
    very common near-identical strings make the PAIR COUNT itself
    superlinear (the r6 probe measured ~5.3x output growth at 10x data
    against ~41x latent pair growth): when set, any value with a
    deletion-signature (sig, pos) block larger than ``max_block`` is
    DROPPED, and the result is EXACT over the surviving values — the
    same pair set a brute-force Levenshtein join over the survivors
    produces. The error is characterized (only pairs touching a
    dropped value are missing) and the cost is bounded: each surviving
    value meets <= (L+1) * max_block substitution candidates and the
    insert/delete branch is capped the same way, so candidates grow
    linearly in the corpus regardless of signature skew. Hot-block
    detection is one extra aggregation over the signature set; the
    block-key set broadcasts (at most |sigs|/max_block blocks can be
    hot) while the hot VALUES — the potentially huge excluded mass —
    anti-join by shuffle.
    """
    # Materialize the distinct value set once (r15): `dels` derives
    # from it and is referenced three times (both substitution join
    # sides + the insert/delete branch), and `v` itself twice — without
    # the cut each reference re-ran the scan + distinct exchange
    # (measured 1.90 -> 1.44 s warm on the sf0.1 LPA edges build;
    # checkpointing `dels` too measured WORSE, 1.63 s — the explode is
    # the cheap-fan-out case of the r14 materialization rule).
    v = (
        values.select(F.col(col).cast("string").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    dels = v.select(
        "v",
        F.expr(
            "explode(transform(sequence(0, length(v) - 1),"
            " i -> struct(concat(substring(v, 1, i), substring(v, i + 2))"
            " AS sig, i AS pos)))"
        ).alias("d"),
    ).select("v", "d.sig", "d.pos")
    if max_block is not None:
        hot = (
            dels.groupBy("sig", "pos")
            .agg(F.count("*").alias("_blk"))
            .filter(F.col("_blk") > max_block)
            .select("sig", "pos")
        )
        # the hot BLOCK-KEY set broadcasts (<= |sigs|/max_block rows);
        # the hot VALUE set is exactly the mass being excluded — it can
        # be arbitrarily large, so it anti-joins by shuffle, never
        # broadcast
        hot_values = (
            dels.join(F.broadcast(hot), ["sig", "pos"], "left_semi")
            .select("v")
            .distinct()
        )
        v = v.join(hot_values, "v", "left_anti").localCheckpoint()
        dels = dels.join(hot_values, "v", "left_anti").localCheckpoint()
    subs = (
        dels.alias("a")
        # shuffle_hash: no downstream ordering need; skipping the
        # sort-merge sorts halves the join wall clock at sf0.1.
        .join(dels.alias("b").hint("shuffle_hash"), on=["sig", "pos"])
        .filter(F.col("a.v") < F.col("b.v"))
        .select(F.col("a.v").alias("a"), F.col("b.v").alias("b"))
    )
    insdel = (
        v.alias("s")
        .join(dels.alias("d"), F.col("s.v") == F.col("d.sig"))
        .filter(F.col("s.v") != F.col("d.v"))
        .select(
            F.least("s.v", "d.v").alias("a"),
            F.greatest("s.v", "d.v").alias("b"),
        )
        .distinct()
    )
    return subs.unionAll(insdel).select(
        "a", "b", F.levenshtein("a", "b").cast("int").alias("dist")
    )
