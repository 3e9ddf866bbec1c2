"""Mergeable cardinality / frequency sketches (HyperLogLog, count-min).

The 100 TB rationale: ``COUNT(DISTINCT x)`` needs a shuffle of every
distinct value; an HLL register vector is a FIXED 2^p-row summary whose
per-partition partials merge by elementwise ``max`` — the same
partial/final split Spark's hash aggregate already performs, so the
distinct-cardinality of a 100 TB column costs one scan plus a
2^p-per-group shuffle.  Likewise a count-min sketch summarizes per-key
frequencies into a fixed ``d×w`` counter grid built by ONE hash
aggregate, with point lookups that never touch the fact table again.

Spark ships HLL internally (``approx_count_distinct``); this module
re-derives the registers with an explicitly portable integer hash so the
DuckDB oracle can replay the register construction bit-for-bit — the
same cross-engine-determinism trade as ``text.winnow_fingerprints``
(polynomial hash over murmur).  The register CONSTRUCTION is the
distributed operator under test; turning 2^p integers into a corrected
estimate is O(m) local math (property-tested, not oracled, because the
bias-corrected branch needs ``ln`` whose libm rounding differs across
engines).  The raw-estimate column IS oracle-safe: every term
``2^(2^p_bits - p_bits) / 2^reg`` is dyadic, so the aggregate sum is an
exact integer and the single IEEE division that follows is identical in
any engine.

All arithmetic stays inside whole-stage codegen — no UDFs, no explode
except the deliberate ``d``-way fan-out of the count-min builder.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

#: Mersenne prime 2^31-1 — the Lehmer modulus.  Keeping every
#: intermediate below 2^62 means the SAME expression runs exactly in any
#: engine with 64-bit integer SQL arithmetic (no overflow, no hugeint).
PRIME = 2_147_483_647

#: depth-indexed multiplier/offset pairs for the count-min hash family
CMS_A = (1_103_515_245, 1_588_635_695, 1_117_695_901, 1_181_783_497)
CMS_B = (12_345, 7_654_321, 2_718_281, 31_415_927)


def lehmer_sql(x: str, a: int = CMS_A[0], b: int = CMS_B[0]) -> str:
    """``((|x| % P) * a + b) % P`` as an engine-shared SQL fragment.

    ``|x| % P < 2^31`` and ``a < 2^31`` keep the product under 2^62:
    exact in int64, hence identical in Spark and DuckDB.  Affine maps
    spread evenly across cells (good for count-min) but have NO
    avalanche — sequential inputs land on a lattice whose max-rank
    statistics wreck HLL.  HLL uses :func:`mix_sql` instead.
    """
    return f"(((abs({x}) % {PRIME}) * {a} + {b}) % {PRIME})"


def mix_sql(x: str) -> str:
    """Nonlinear portable mix: affine → square mod P → affine feedback.

    ``h1 = (|x|%P)·A + B mod P;  h = (h1² mod P)·A + h1 mod P`` — the
    squaring breaks the lattice an affine-only map leaves in sequential
    ids (measured: HLL error drops from ~50% to within the canonical
    1.04/√m bound).  Every intermediate stays below 2^62, so the SAME
    string evaluates identically in Spark and DuckDB int64 arithmetic.
    """
    h1 = lehmer_sql(x)
    return (f"((({h1} * {h1}) % {PRIME}) * {CMS_A[0]} + {h1})"
            f" % {PRIME}")


def bit_length_sql(v: str, max_bits: int) -> str:
    """Integer bit-length as a comparison CASE cascade (0 for v = 0).

    ``floor(log2(v))`` would be one call, but ``log2`` is libm floating
    point and ``log(8)/log(2) = 2.9999…96`` style off-by-ones differ per
    engine; integer comparisons cannot.  Shared verbatim by the Spark
    plan and the DuckDB oracle.
    """
    arms = " ".join(
        f"WHEN {v} >= {1 << (bits - 1)} THEN {bits}"
        for bits in range(max_bits, 0, -1)
    )
    return f"(CASE {arms} ELSE 0 END)"


def hll_rank_sql(x: str, p_bits: int) -> str:
    """Bucket + rank of one item: ``(bucket, 1 + leading-zeros(rest))``.

    Returns the SQL for the rank given ``__h`` already computed; the
    caller extracts ``bucket = __h % 2^p`` separately.  With a 31-bit
    Lehmer hash and ``p_bits`` bucket bits the remaining width is
    ``w = 31 - p_bits``; ``rank = w + 1 - bit_length(rest)`` ∈ [1, w+1].
    """
    w = 31 - p_bits
    rest = f"CAST(floor({x} / {1 << p_bits}.0) AS BIGINT)"
    return f"({w} + 1 - {bit_length_sql(rest, w)})"


def hll_registers(df: DataFrame, group_cols: Sequence[str], item_col: str,
                  p_bits: int = 8) -> DataFrame:
    """Per-group HLL register vector: ``group_cols + (bucket, reg)``.

    One hash aggregate — Spark's partial/final split IS the HLL merge
    (``max`` per register), so this is a single shuffle of at most
    ``2^p_bits`` rows per group regardless of input size.  Buckets no
    item hashed into are ABSENT (implicit register 0); ``hll_summary``
    accounts for them closed-form.
    """
    h = mix_sql(item_col)
    m = 1 << p_bits
    return (
        df.select(*group_cols, F.expr(h).alias("__h"))
        .select(*group_cols,
                F.expr(f"__h % {m}").alias("bucket"),
                F.expr(hll_rank_sql("__h", p_bits)).alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("reg"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge register vectors from independent scans (elementwise max).

    The mergeability that makes HLL a 100 TB operator: yesterday's
    registers + today's registers = the union's registers, without
    rescanning yesterday.
    """
    merged = register_frames[0]
    for other in register_frames[1:]:
        merged = merged.unionByName(other)
    keys = [c for c in merged.columns if c != "reg"]
    return merged.groupBy(*keys).agg(F.max("reg").alias("reg"))


def hll_summary_cols(p_bits: int = 8) -> dict[str, str]:
    """Engine-shared aggregate SQL over a register frame (group cols +
    ``bucket`` + ``reg``), for use inside a GROUP BY over the group cols.

    Returns column-name -> SQL aggregate:

    - ``hll_est``: the RAW HLL estimate ``floor(α_m · m² / Σ 2^-reg)``,
      computed overflow- and libm-safely: the sum is scaled by ``2^w``
      so every term is an exact integer, absent buckets contribute
      ``2^w`` each, and the single final division is IEEE-identical in
      every engine.  (No small-range linear-counting correction here —
      that needs ``ln``; see ``hll_estimate_corrected``.)
    - ``hll_zero_regs``: number of zero registers (drives the corrected
      estimate, and an independent determinism witness).
    - ``hll_reg_digest``: position-weighted integer digest of the whole
      register vector — the oracle row pins every register, not just
      the two scalars.
    """
    m = 1 << p_bits
    w = 31 - p_bits
    alpha = f"(0.7213 / (1.0 + 1.079 / {m}.0))"
    # 2^(w - reg) as round(power(2,k)): integer powers of two are exact
    # in IEEE double for any libm, round() guards a stray ulp
    term = f"CAST(round(power(2.0, {w} - reg)) AS BIGINT)"
    inv_scaled = (f"(CAST(sum({term}) AS BIGINT)"
                  f" + ({m} - count(*)) * {1 << w})")
    return {
        "hll_est": (f"CAST(floor({alpha} * {m}.0 * {m}.0 * {1 << w}.0"
                    f" / {inv_scaled}) AS BIGINT)"),
        "hll_zero_regs": f"CAST({m} - count(*) AS BIGINT)",
        "hll_reg_digest": (f"CAST(sum(reg * ((bucket * 2654435761 + 1)"
                           f" % {PRIME})) AS BIGINT)"),
    }


def hll_summary(registers: DataFrame, group_cols: Sequence[str],
                p_bits: int = 8) -> DataFrame:
    """Collapse a register frame to per-group estimate columns."""
    aggs = [F.expr(sql).alias(name)
            for name, sql in hll_summary_cols(p_bits).items()]
    return registers.groupBy(*group_cols).agg(*aggs)


def hll_estimate_corrected(registers: DataFrame,
                           group_cols: Sequence[str],
                           p_bits: int = 8) -> DataFrame:
    """Bias-corrected estimate (Flajolet et al. 2007 small-range rule):
    below ``5/2·m`` with zero registers present, switch to linear
    counting ``m·ln(m/V)``.  Uses ``ln`` → library-quality accuracy,
    property-tested rather than cross-engine-oracled.
    """
    m = 1 << p_bits
    s = hll_summary(registers, group_cols, p_bits)
    lin = F.lit(m) * F.log(F.lit(float(m)) / F.col("hll_zero_regs"))
    corrected = (
        F.when((F.col("hll_est") <= int(2.5 * m))
               & (F.col("hll_zero_regs") > 0), lin)
        .otherwise(F.col("hll_est").cast("double"))
    )
    return s.select(*group_cols,
                    F.round(corrected).cast("long").alias("n_distinct_est"))


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def cms_cell_sql(item: str, depth: int, width: int) -> str:
    """Cell coordinate of ``item`` at ``depth`` — engine-shared."""
    return f"({lehmer_sql(item, CMS_A[depth], CMS_B[depth])} % {width})"


def cms_build(df: DataFrame, item_col: str, depth: int = 4,
              width: int = 512, weight_col: str | None = None) -> DataFrame:
    """Build the ``d×w`` counter grid: ``(i, cell, cnt)``.

    One deliberate ``d``-way explode then ONE hash aggregate to at most
    ``d·w`` rows — partial aggregation compresses each input partition
    to ≤ d·w counters before the (tiny) shuffle, so the fact table is
    scanned once and shuffles nothing proportional to its size.
    """
    wexpr = f"CAST({weight_col} AS BIGINT)" if weight_col else "1"
    cells = F.expr(
        "array(" + ", ".join(
            f"named_struct('i', {i}, 'cell', {cms_cell_sql(item_col, i, width)})"
            for i in range(depth)) + ")")
    return (
        df.select(F.explode(cells).alias("c"), F.expr(wexpr).alias("__w"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.cell").alias("cell"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_lookup(grid: DataFrame, keys: DataFrame, item_col: str,
               depth: int = 4, width: int = 512) -> DataFrame:
    """Point-estimate every row of ``keys``: ``min_i grid[i][h_i(key)]``.

    Never an underestimate (counters only ever include extra
    collisions); exact when no colliding key shares all ``d`` cells.
    The grid side is ≤ ``d·w`` rows → broadcast join.
    """
    coords = F.expr(
        "array(" + ", ".join(
            f"named_struct('i', {i}, 'cell', {cms_cell_sql(item_col, i, width)})"
            for i in range(depth)) + ")")
    probes = keys.select("*", F.explode(coords).alias("__c"))
    out_cols = [c for c in keys.columns]
    return (
        probes.join(F.broadcast(grid),
                    (probes["__c.i"] == grid["i"])
                    & (probes["__c.cell"] == grid["cell"]), "left")
        .groupBy(*out_cols)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )
