"""Registry entries for the model-evaluation operators
(operators/evaluation.py): confusion report, rank-free ROC-AUC,
calibration bins, cumulative gains/lift.

Same contract as registry_ops.py: every entry pairs the Spark plan with
an exact DuckDB twin. The scored frame quantizes the sigmoid score to
the 1e-6 grid once (evaluation.py module docstring), so thresholds,
bin edges and rank arithmetic all operate on identical doubles in both
engines; derived ratios are qround-pinned with identical expression
shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .numeric import sql_dsum as _d
from .numeric import sql_qround as _q
from .operators import evaluation as ev
from .registry import register
from .tables import load

_W = ev.EVAL_WEIGHTS
_Z = f"({_W[0]} * f0 + {_W[1]} * f1 + {_W[2]} * f2 + {_W[3]} * f3)"

_SCORED = f"""f AS (
      SELECT CASE WHEN lang = '{ev.EVAL_LABEL_LANG}' THEN 1 ELSE 0 END AS y,
             1.0 AS f0,
             CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0 AS f1,
             CAST(n_chars AS DOUBLE) / 1000.0 AS f2,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS f3
      FROM documents),
    s AS (SELECT y,
                 {_q(f"1.0 / (1.0 + exp(-{_Z}))", 6)} AS p
          FROM f)"""

_CAL_G = f"""g AS (
      SELECT CAST(least(floor(p * {float(ev.EVAL_CAL_BINS)}),
                        {ev.EVAL_CAL_BINS - 1}) AS INT) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             {_d('p')} AS sp,
             CAST(sum(y) AS BIGINT) AS n_pos
      FROM s GROUP BY 1)"""


def _q_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation — confusion matrix + accuracy/precision/recall/F1 at
    the frozen threshold (operators/evaluation.py:classifier_eval_report):
    one scalar map-side-combined aggregate."""
    return ev.classifier_eval_report(load(spark, sf_dir, "documents"))


register(
    "classifier_eval_report",
    _q_eval_report,
    f"""WITH {_SCORED},
        g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum((CASE WHEN p >= {ev.EVAL_THRESHOLD} THEN 1 ELSE 0 END) * y) AS BIGINT) AS tp,
                     CAST(sum((CASE WHEN p >= {ev.EVAL_THRESHOLD} THEN 1 ELSE 0 END) * (1 - y)) AS BIGINT) AS fp,
                     CAST(sum((1 - CASE WHEN p >= {ev.EVAL_THRESHOLD} THEN 1 ELSE 0 END) * y) AS BIGINT) AS fn,
                     CAST(sum((1 - CASE WHEN p >= {ev.EVAL_THRESHOLD} THEN 1 ELSE 0 END) * (1 - y)) AS BIGINT) AS tn
              FROM s),
        d AS (SELECT n, tp, fp, fn, tn,
                     CAST(tp AS DOUBLE) AS tpd, CAST(fp AS DOUBLE) AS fpd,
                     CAST(fn AS DOUBLE) AS fnd, CAST(tn AS DOUBLE) AS tnd,
                     CAST(n AS DOUBLE) AS nd
              FROM g)
        SELECT n, tp, fp, fn, tn,
               {_q("(tpd + tnd) / nd", 6)} AS accuracy,
               {_q("tpd / (tpd + fpd)", 6)} AS precision_,
               {_q("tpd / (tpd + fnd)", 6)} AS recall_,
               {_q("2.0 * (tpd / (tpd + fpd)) * (tpd / (tpd + fnd)) / ((tpd / (tpd + fpd)) + (tpd / (tpd + fnd)))", 6)} AS f1
        FROM d""",
)


def _q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation — rank-free ROC-AUC via the Mann-Whitney identity over
    the quantized-score histogram (operators/evaluation.py:roc_auc)."""
    return ev.roc_auc(load(spark, sf_dir, "documents"))


register(
    "roc_auc_score",
    _q_roc_auc,
    f"""WITH {_SCORED},
        vals AS (SELECT p AS v, sum(y) AS cp, sum(1 - y) AS cn
                 FROM s GROUP BY 1),
        r AS (SELECT cp, cn, cp + cn AS t,
                     coalesce(sum(cp + cn) OVER (
                       ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cum_lt
              FROM vals),
        agg AS (SELECT CAST(sum(CAST(cp AS DECIMAL(38,0))) AS DOUBLE) AS n_pos,
                       CAST(sum(CAST(cn AS DECIMAL(38,0))) AS DOUBLE) AS n_neg,
                       CAST(sum(CAST(cp * (2 * cum_lt + t + 1) AS DECIMAL(38,0)))
                            AS DOUBLE) AS r2p
                FROM r)
        SELECT CAST(n_pos AS BIGINT) AS n_pos,
               CAST(n_neg AS BIGINT) AS n_neg,
               {_q("(r2p - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg)", 6)} AS auc
        FROM agg""",
)


def _q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation — reliability table over fixed-width score bins
    (operators/evaluation.py:calibration_bins): one bounded-group
    aggregate."""
    return ev.calibration_bins(load(spark, sf_dir, "documents"))


register(
    "calibration_bins",
    _q_calibration,
    f"""WITH {_SCORED},
        {_CAL_G}
        SELECT bin, n, n_pos,
               {_q("sp / CAST(n AS DOUBLE)", 6)} AS mean_score,
               {_q("CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS pos_rate
        FROM g ORDER BY bin""",
)


def _q_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation — cumulative gains/lift by descending score bin
    (operators/evaluation.py:gains_lift_table): bounded bin window +
    broadcast scalar totals."""
    return ev.gains_lift_table(load(spark, sf_dir, "documents"))


register(
    "gains_lift_table",
    _q_gains,
    f"""WITH {_SCORED},
        {_CAL_G},
        t AS (SELECT sum(n) AS tot_n, sum(n_pos) AS tot_pos FROM g),
        c AS (SELECT bin, n,
                     sum(n) OVER (ORDER BY bin DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_n,
                     sum(n_pos) OVER (ORDER BY bin DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_pos
              FROM g)
        SELECT bin, CAST(n AS BIGINT) AS n,
               CAST(cum_n AS BIGINT) AS cum_n,
               CAST(cum_pos AS BIGINT) AS cum_pos,
               {_q("CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE)", 6)}
                 AS capture_rate,
               {_q("(CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) / (CAST(tot_pos AS DOUBLE) / CAST(tot_n AS DOUBLE))", 6)}
                 AS cum_lift
        FROM c CROSS JOIN t ORDER BY bin DESC""",
)


def _q_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation — isotonic (PAV) calibration of the reliability table
    via the exact minimax interval formula
    (operators/evaluation.py:isotonic_calibration)."""
    return ev.isotonic_calibration(load(spark, sf_dir, "documents"))


register(
    "isotonic_calibration",
    _q_isotonic,
    f"""WITH {_SCORED},
        {_CAL_G},
        pre AS (
          SELECT bin, n, n_pos,
                 sum(n) OVER wc AS cn, sum(n_pos) OVER wc AS cpos
          FROM g
          WINDOW wc AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)),
        prevs AS (SELECT bin, cn, cpos FROM pre
                  UNION ALL SELECT -1, 0, 0),
        iv AS (
          SELECT j.bin + 1 AS j, k.bin AS k,
                 CAST(k.cpos - j.cpos AS DOUBLE)
                   / CAST(k.cn - j.cn AS DOUBLE) AS mean_rate
          FROM pre k JOIN prevs j ON j.bin + 1 <= k.bin),
        inner_min AS (
          SELECT i.bin AS i, iv.j, min(iv.mean_rate) AS mn
          FROM pre i JOIN iv ON iv.j <= i.bin AND iv.k >= i.bin
          GROUP BY 1, 2),
        iso AS (SELECT i, max(mn) AS iso FROM inner_min GROUP BY i)
        SELECT p.bin, p.n, p.n_pos,
               {_q('CAST(p.n_pos AS DOUBLE) / CAST(p.n AS DOUBLE)', 6)}
                 AS pos_rate,
               {_q('iso.iso', 6)} AS isotonic_rate
        FROM pre p JOIN iso ON p.bin = iso.i
        ORDER BY p.bin""",
)
