"""Hashed-feature linear quality classifier (fastText / DataComp-style
learned quality gate).

The standard learned companion to the heuristic gates
(``text.gopher_rules``, ``text.c4_line_filter``,
``text.unigram_logprob``): logistic regression over hashed
bag-of-tokens features, trained by FULL-BATCH gradient descent in fixed
point, scored in-row at scan speed. Public recipe (Joulin et al. 2016
fastText; DataComp/DCLM quality filtering) — implemented from the math.

Spark-first shape (the same discipline as the fixed-point Lloyd loop in
``clustering.kmeans_fixed_point``):

- **features never materialize**: the margin ``z_i = Σ_tok
  w[bucket(tok)] + w_bias`` is ONE in-row fold over the token array
  against the weight vector broadcast as a literal array — the DSIR
  scoring shape, whole-stage codegen, no shuffle;
- **one aggregate per GD iteration**: the gradient ``g_j = Σ_i r_i ·
  x_ij`` is a partial+final ``groupBy(bucket).sum(residual)`` over the
  exploded-token frame — ≤ ``buckets+1`` longs cross the wire; weights
  (``(buckets+1)`` ints) update driver-side and re-broadcast;
- **deterministic and oracle-replayable**: weights live in fixed point
  (scale ``2^scale_bits``), the sigmoid is the Elliott "fast sigmoid"
  ``σ̃(m) = 1/2 + m / (2(1+|m|))`` — exact integer arithmetic, no exp()
  (libm rounding is not reproducible across engines) — margins clamp at
  ±``clamp`` pre-sigmoid, residuals quantize half-up to the weight
  scale, and the update uses FLOOR division — python ``//`` floors,
  but DuckDB ``//`` TRUNCATES toward zero (measured off-by-one on
  negative gradients), so the oracle spells out the negative branch;
  all Spark-side ``div`` numerators are non-negative, where the two
  agree. Every integer therefore matches a DuckDB replay bit for bit
  (the ``xquality_classifier`` oracle re-runs the whole trajectory).

Overflow headroom (ANSI mode fails loudly, session-pinned): with
``scale_bits=20``, ``clamp=16`` the residual fits 2^21, a gradient cell
fits ``total_tokens · 2^20`` — 2^50 at 10^9 training tokens; at a
10^12-token corpus drop ``scale_bits`` to 10 or subsample the training
split (a quality gate is trained on a sample anyway — scoring, not
training, is the 100 TB pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.functions.columns import poly_hash31


#: Backend of the hashed-feature bucket build: ``arrow`` = the
#: vectorized kernel (``functions/arrow_hash.py::hashed_bucket_set_udf``
#: — bit-exact poly31 buckets in one ArrowEvalPython); ``jvm`` = the
#: interpreted per-token transform (the SQL-replayable definition, kept
#: as the correctness twin — equivalence pytest-pinned). Flipped by
#: tests only; the xxhash64 profile stays JVM (codegen-native).
_CLS_SCAN_BACKEND = "arrow"

#: Backend of the per-iteration GRADIENT pass (r18, guide §4.2):
#: ``arrow`` = one ``mapInArrow`` kernel per iteration computes the
#: margin fold, the clamp, the Elliott residual quantization, AND the
#: per-bucket partial gradient in exact int64 numpy — the iteration
#: job collapses to scan → kernel → ≤(buckets+1)-row final sum,
#: with no weight broadcast join, no interpreted fold, no exploded
#: (row × bucket) exchange. ``jvm`` = the staged broadcast-weight-row
#: formulation (the SQL-replayable definition, kept as the
#: correctness twin — trajectory equality pytest-pinned). All
#: arithmetic is integer (clip/abs/floor-div on int64 wraps exactly
#: like the JVM longs at these magnitudes), so the trajectories are
#: equal bit for bit.
_CLS_GRAD_BACKEND = "arrow"


def _bucket_of(tok: Column, buckets: int, hash_fn: str) -> Column:
    if hash_fn == "poly":
        return F.pmod(poly_hash31(tok), F.lit(buckets))
    return F.pmod(F.xxhash64(tok), F.lit(buckets))


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.trim(F.lower(text)), r"\s+"), lambda t: t != ""
    )


def _bucket_set(text: Column, buckets: int, hash_fn: str) -> Column:
    """Distinct presence-feature buckets of a text column — rides
    :data:`_CLS_SCAN_BACKEND` for the poly profile (r17, guide §4: the
    per-token interpreted char fold dominated the feature build)."""
    if hash_fn == "poly" and _CLS_SCAN_BACKEND == "arrow":
        from kamu_engine_datafusion_spark.functions.arrow_hash import (
            hashed_bucket_set_udf,
        )

        return hashed_bucket_set_udf(buckets)(text)
    return F.array_distinct(
        F.transform(
            _tokens(text), lambda t: _bucket_of(t, buckets, hash_fn)
        )
    )


def _margin_expr(
    text: Column, weights: list[int], buckets: int, hash_fn: str
) -> Column:
    """In-row fixed-point margin over PRESENCE features:
    ``Σ_{distinct buckets present} w_j + w_bias`` (weights a literal
    array — scan-speed scoring, no join). Binarized hashed features
    (the fastText trick) rather than raw counts: count features swamp
    a presence signal under few-iteration unnormalized GD (measured:
    count features froze at the base rate on the test corpus; presence
    reaches 0.98 accuracy). NULL/empty text scores the bias alone."""
    warr = F.array(*[F.lit(int(w)).cast("long") for w in weights[:-1]])
    bs = _bucket_set(text, buckets, hash_fn)
    s = F.aggregate(
        bs,
        F.lit(0).cast("long"),
        lambda acc, j: acc + F.element_at(warr, (j + 1).cast("int")),
    )
    return F.coalesce(s, F.lit(0)) + F.lit(int(weights[-1])).cast("long")


def train_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    buckets: int = 128,
    iters: int = 12,
    lr_num: int = 16,
    lr_den: int = 1,
    scale_bits: int = 20,
    clamp: int = 16,
    hash_fn: str = "poly",
) -> list[list[int]]:
    """Full-batch fixed-point GD from zero weights with a deterministic
    1/t learning-rate schedule (``lr_t = lr_num / (lr_den · t)`` —
    constant-rate full-batch GD OSCILLATES on correlated hashed
    features; measured 0.24↔0.83 accuracy flapping vs a stable 0.98
    with the decay). Returns the weight TRAJECTORY ``[w_0, …,
    w_iters]`` (each ``buckets+1`` ints, bias LAST = feature index
    ``buckets``, present in every row) so callers — and the oracle —
    can replay any step. ``label_col`` must be 0/1; ``id_col``
    row-unique (it keys the residual join back onto the feature
    frame).

    Per iteration: margins fold in-row against the literal weights,
    residuals quantize in-row — ``round_half_up(σ̃·S)`` via the pure
    integer identity ``(2a + b) div (2b)`` (operands non-negative, so
    Spark ``div`` ≡ floor ≡ the oracle's ``//``) — and ONE
    ``groupBy(feature)`` aggregate over the distinct (row, bucket)
    frame emits ≤ ``buckets+1`` gradient longs (map-side combine caps
    per-task state at the same). The feature frame is
    localCheckpoint-ed once — iterations re-read columnar cache, not
    parquet (swap for ``persist(MEMORY_AND_DISK)`` at true corpus
    scale).
    """
    scale = 1 << scale_bits
    # hash/tokenize ONCE: the checkpointed base carries the distinct
    # bucket ARRAY per row, so each iteration's margin is a plain array
    # fold over pre-hashed ints — re-tokenizing + re-hashing text every
    # iteration measured 46.6s for 12 iterations on 50k docs vs 19.4s
    # (2.4×) with the prehashed array (SCALE.md r10)
    base = df.select(
        F.col(id_col).alias("__rid"),
        _bucket_set(F.col(text_col), buckets, hash_fn).alias("__bs"),
        F.col(label_col).cast("long").alias("__y"),
    ).localCheckpoint(eager=True)
    if _CLS_GRAD_BACKEND == "arrow":
        # the kernel path derives n from its own first pass (the bias
        # feature is present in every row), so the standalone count
        # job is fused away; the empty-frame ValueError is unchanged
        return _train_arrow(
            base, buckets, iters, lr_num, lr_den, scale_bits, clamp
        )
    n = base.count()
    if n == 0:
        raise ValueError("train_quality_classifier: empty training frame")
    # presence features per row = distinct buckets + the always-on bias
    # feature j = buckets, appended IN-ROW: the gradient explodes this
    # array straight out of the cached base — the former
    # exploded-frame + per-iteration __rid JOIN shape paid two extra
    # exchanges per iteration and an extra checkpoint job for the same
    # integer sums (r17, guide §2.2). NULL __bs (null text) must still
    # contribute its bias row, hence the coalesce.
    feat = F.concat(
        F.coalesce(F.col("__bs"), F.array().cast("array<long>")),
        F.array(F.lit(buckets).cast("long")),
    )

    w = [0] * (buckets + 1)
    traj = [list(w)]
    lim = clamp * scale
    spark = df.sparkSession
    for it in range(1, iters + 1):
        # weights enter as broadcast DATA (one row), not literals: 12
        # iterations with literal arrays are 12 DIFFERENT plans — each
        # pays full analysis + janino codegen (~0.3-0.5 s/iteration of
        # pure compile, measured r17); with weights as an attribute
        # the plan SOURCE is identical every iteration and the codegen
        # cache hits. Inside the interpreted fold an attribute is just
        # a row-value read (the r9 bloom-bitmap lesson) — values
        # identical.
        wrow = spark.createDataFrame(
            [([int(x) for x in w[:-1]], int(w[-1]))],
            "__warr array<bigint>, __wb bigint",
        )
        wbase = base.crossJoin(F.broadcast(wrow))
        z = F.coalesce(
            F.aggregate(
                F.col("__bs"),
                F.lit(0).cast("long"),
                lambda acc, j: acc
                + F.element_at("__warr", (j + 1).cast("int")),
            ),
            F.lit(0),
        ) + F.col("__wb")
        zc = F.greatest(F.least(z, F.lit(lim)), F.lit(-lim)).cast("long")
        # stage the clamped margin FIRST: az/num/den reference it three
        # times between them, and the interpreted fold gets no codegen
        # CSE — unstaged, the whole margin tree evaluated 3x per row
        # per iteration (r17). The staged alias survives
        # CollapseProject (non-cheap, multiply referenced); num/den
        # stay staged too (den is referenced twice by the div
        # identity).
        zbase = wbase.select("__y", "__bs", zc.alias("__zc"))
        az = F.abs(F.col("__zc"))
        res_base = zbase.select(
            "__y",
            "__bs",
            ((F.lit(scale) + az + F.col("__zc")) * F.lit(scale)).alias(
                "__num"
            ),
            (F.lit(2).cast("long") * (F.lit(scale) + az)).alias("__den"),
        )
        res_expr = (
            F.expr("(2 * __num + __den) div (2 * __den)")
            - F.col("__y") * F.lit(scale)
        ).cast("long")
        g_rows = (
            res_base.select(
                res_expr.alias("__r"), F.explode(feat).alias("__j")
            )
            .groupBy("__j")
            .agg(F.sum("__r").alias("__g"))
            .collect()
        )
        g = {int(r["__j"]): int(r["__g"]) for r in g_rows}
        w = [
            w[j] - (lr_num * g.get(j, 0)) // (lr_den * it * n)
            for j in range(buckets + 1)
        ]
        traj.append(list(w))
    return traj


def _train_arrow(
    base: DataFrame,
    buckets: int,
    iters: int,
    lr_num: int,
    lr_den: int,
    scale_bits: int,
    clamp: int,
) -> list[list[int]]:
    """The GD loop with the per-iteration gradient as ONE ``mapInArrow``
    kernel (r18, guide §4.2): margins, the ±clamp, the Elliott residual
    quantization and the per-bucket partial gradient all run in exact
    int64 numpy per task; only ≤ ``buckets + 2`` partial longs per task
    cross back for the final sum. Bit-identical to the JVM twin: every
    step is int64 arithmetic (sums bounded far below 2^63 by the
    module's documented overflow envelope), clip/abs/floor-div on
    non-negative operands agree exactly, and the trajectory-equality
    pytest pins it. ``n`` comes from the first pass's count row
    (feature frame rows, incl. NULL-text rows — identical to the old
    standalone ``count()``)."""
    scale = 1 << scale_bits
    lim = clamp * scale
    w = [0] * (buckets + 1)
    traj = [list(w)]
    n = None
    for it in range(1, iters + 1):
        warr = list(w)

        def _grad(batches, _w=warr):
            import numpy as np
            import pyarrow as pa

            wnp = np.asarray(_w, dtype=np.int64)
            g = np.zeros(buckets + 1, dtype=np.int64)
            rows = 0
            for batch in batches:
                bs = batch.column(0)
                y = batch.column(1).to_numpy(zero_copy_only=False)
                y = y.astype(np.int64, copy=False)
                nr = len(y)
                if nr == 0:
                    continue
                rows += nr
                import pyarrow.compute as pc

                lens = (
                    pc.list_value_length(bs)
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                )
                lens = np.nan_to_num(lens, nan=0.0).astype(np.int64)
                vals = bs.flatten().to_numpy(zero_copy_only=False)
                vals = vals.astype(np.int64, copy=False)
                idx = np.repeat(np.arange(nr, dtype=np.int64), lens)
                # margin: Σ w[bucket] per row + bias (NULL/empty bucket
                # arrays contribute the bias alone, like the JVM
                # coalesce)
                z = np.zeros(nr, dtype=np.int64)
                np.add.at(z, idx, wnp[vals])
                z += wnp[buckets]
                zc = np.clip(z, -lim, lim)
                az = np.abs(zc)
                num = (scale + az + zc) * scale
                den = 2 * (scale + az)
                r = (2 * num + den) // (2 * den) - y * scale
                # per-bucket partial gradient; bias row = Σ residuals
                np.add.at(g, vals, r[idx])
                g[buckets] += int(r.sum())
            if rows:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(
                            list(range(buckets + 1)) + [-1],
                            type=pa.int64(),
                        ),
                        pa.array(
                            g.tolist() + [rows], type=pa.int64()
                        ),
                    ],
                    ["__j", "__g"],
                )

        g_rows = (
            base.select("__bs", "__y")
            .mapInArrow(_grad, "__j long, __g long")
            .groupBy("__j")
            .agg(F.sum("__g").alias("__g"))
            .collect()
        )
        g = {int(r["__j"]): int(r["__g"]) for r in g_rows}
        if n is None:
            n = g.pop(-1, 0)
            if n == 0:
                raise ValueError(
                    "train_quality_classifier: empty training frame"
                )
        else:
            g.pop(-1, None)
        w = [
            w[j] - (lr_num * g.get(j, 0)) // (lr_den * it * n)
            for j in range(buckets + 1)
        ]
        traj.append(list(w))
    return traj


def score_quality(
    df: DataFrame,
    text_col: str,
    weights: list[int],
    buckets: int = 128,
    scale_bits: int = 20,
    hash_fn: str = "poly",
    out_col: str = "quality_margin",
) -> DataFrame:
    """Append the fixed-point margin (``> 0`` ⇒ predicted positive) —
    one in-row fold per row at scan speed, weights as literals. Divide
    by ``2^scale_bits`` for the real-valued margin; feed to the Elliott
    sigmoid for a [0,1] score."""
    return df.withColumn(
        out_col, _margin_expr(F.col(text_col), weights, buckets, hash_fn)
    )
