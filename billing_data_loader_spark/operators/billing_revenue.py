"""Revenue-engine operators (SURVEY.md §2.11 extensions, round 11):
tiered usage rating, straight-line revenue recognition, FIFO payment
application, and the cohort-LTV triangle — the four query shapes a
subscription/usage billing warehouse computes on every close cycle,
each as pure DataFrame relational algebra with a DuckDB oracle twin.

Scale stance: rating and rev-rec are MAP-SIDE expansions (a bounded
per-row tier/month explode) into small-keyspace aggregates — no joins,
no data-sized shuffle keys. FIFO application shuffles on the customer
key exactly twice (two cumulative windows) plus one customer-keyed
range join whose match count is O(n_invoices + n_payments) per customer
by the interval-overlap bound, never the cross product. LTV collapses
events to one row per user FIRST (the agg_retention_cohort discipline),
so the triangle math runs on the distinct-user frame.

All money flows as exact integer cents (functions/determinism
.quantize_long); the only doubles are final closed-form divisions whose
expression text is shared verbatim with the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.determinism import quantize_long
from ..plans.registry import query
from ..tables import load

# --- bill_tiered_rating ------------------------------------------------------

#: Graduated rate schedule: (tier label, lower bound, tier width in
#: units, cents per unit). The last tier is unbounded — its width is an
#: effectively-infinite sentinel so the SAME clamp formula
#: least(greatest(q - lo, 0), width) prices every tier.
_TIERS = [
    ("t1_0_10", 0, 10, 150),
    ("t2_10_30", 10, 20, 120),
    ("t3_30_up", 30, 1000000, 90),
]

_TIER_ORACLE = f"""
WITH t(tier, lo, width, rate) AS (
  VALUES {", ".join(f"('{n}', {lo}, {w}, {r})" for n, lo, w, r in _TIERS)}
), u AS (
  SELECT l_returnflag, t.tier, t.rate,
         LEAST(GREATEST(CAST(floor(l_quantity + CAST(0.5 AS DOUBLE))
                             AS BIGINT) - t.lo, 0), t.width) AS units
  FROM lineitem, t
)
SELECT l_returnflag, tier,
       CAST(SUM(units) AS BIGINT) AS units,
       CAST(SUM(units * rate) AS BIGINT) AS revenue_cents,
       CAST(SUM(units * rate) AS DOUBLE) / CAST(SUM(units) AS DOUBLE)
         AS effective_rate
FROM u WHERE units > 0
GROUP BY l_returnflag, tier
"""


@query("bill_tiered_rating", oracle=_TIER_ORACLE, tier=2)
def bill_tiered_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graduated (tiered) usage rating — the core metering-to-money
    operator of a usage-billing engine: each line's quantity is split
    across rate brackets (first 10 units at full rate, the next 20
    discounted, the tail at the volume rate) and each bracket is priced
    at its own cents-per-unit. One clamp formula prices every tier:
    units_in_tier = least(greatest(q - lo, 0), width), with the open
    tail bracket closed by a sentinel width so no tier is special-cased.

    Shape: a bounded 3-struct map-side explode (never a join — the rate
    schedule is a literal array in the row expression) into a
    (returnflag x tier) aggregate whose key space is fixed at any corpus
    size; partial aggregation absorbs the 3x row expansion map-side. At
    100 TB this is a single scan with combine — the ideal shape.
    Quantities quantize to exact integer units and rates are integer
    cents, so units/revenue are exact longs; the only double is the
    effective-rate division, shared-text with the oracle."""
    tier_structs = ", ".join(
        f"struct('{n}' AS tier, "
        f"least(greatest(q - {lo}, 0), {w}) AS units, {r} AS rate)"
        for n, lo, w, r in _TIERS
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr(
            "CAST(floor(l_quantity + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("q"),
    )
    tiered = li.select(
        "l_returnflag",
        F.expr(f"explode(array({tier_structs}))").alias("t"),
    ).select("l_returnflag", "t.*")
    return (
        tiered.filter(F.col("units") > 0)
        .groupBy("l_returnflag", "tier")
        .agg(
            F.sum("units").alias("units"),
            F.sum(F.expr("units * rate")).alias("revenue_cents"),
            F.expr(
                "CAST(SUM(units * rate) AS DOUBLE)"
                " / CAST(SUM(units) AS DOUBLE)"
            ).alias("effective_rate"),
        )
    )


# --- bill_revenue_recognition ------------------------------------------------

# Largest-remainder allocation: floor(cents / n) per month, with the
# remainder's pennies assigned to the FIRST (cents % n) months — exact
# conservation (sum of schedule == invoice cents) with a deterministic
# penny placement, the standard rev-rec ledger rule.
_REVREC_ORACLE = """
WITH c AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents,
         1 + o_orderkey % 12 AS n,
         date_trunc('month', o_orderdate) AS start_m
  FROM orders
), s AS (
  SELECT o_orderkey, cents, n, start_m,
         unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS m
  FROM c
)
SELECT CAST(start_m + to_months(CAST(m AS INTEGER)) AS DATE) AS rec_month,
       CAST(SUM(cents // n + CASE WHEN m < cents % n THEN 1 ELSE 0 END)
            AS BIGINT) AS recognized_cents,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_contracts
FROM s
GROUP BY rec_month
"""


@query("bill_revenue_recognition", oracle=_REVREC_ORACLE, tier=2)
def bill_revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Straight-line monthly revenue recognition: each order is a
    contract whose total spreads evenly over a service term of
    1 + (o_orderkey % 12) months starting at its order month, with
    penny-exact largest-remainder allocation — month m recognizes
    floor(cents/n) plus one extra cent iff m < cents % n, so the
    schedule conserves the invoice total EXACTLY (the ledger must
    balance; tests pin conservation) and the penny placement is
    deterministic, not rounding-dependent.

    Shape: a map-side month explode (bounded by the 12-month max term)
    into a recognition-month aggregate — key space is the calendar, not
    the order count, so partial aggregation collapses almost everything
    before the shuffle at any scale. The COUNT(DISTINCT contract) per
    month rides the same shuffle as a two-level aggregate. All amounts
    are exact integer cents end to end."""
    c = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        quantize_long("o_totalprice", 2).alias("cents"),
        (F.lit(1) + F.col("o_orderkey") % 12).alias("n"),
        F.expr("trunc(o_orderdate, 'MM')").alias("start_m"),
    )
    s = c.select(
        "o_orderkey",
        "cents",
        "n",
        "start_m",
        F.expr("explode(sequence(CAST(0 AS BIGINT), n - 1))").alias("m"),
    )
    return (
        s.groupBy(F.expr("add_months(start_m, m)").alias("rec_month"))
        .agg(
            F.sum(
                F.expr(
                    "cents DIV n"
                    " + CASE WHEN m < cents % n THEN 1 ELSE 0 END"
                )
            ).alias("recognized_cents"),
            F.countDistinct("o_orderkey").alias("n_contracts"),
        )
    )


# --- bill_credit_fifo --------------------------------------------------------

# FIFO interval-overlap allocation: invoice i (cumulative window
# (inv_cum - cents, inv_cum]) receives from payment p (cumulative window
# (pay_cum - pc, pay_cum]) the overlap of the two intervals. The join
# predicate keeps exactly the overlapping pairs, so the match count per
# customer is O(n_inv + n_pay) — each allocation boundary is crossed
# once — never the cross product.
#: The invoice/payment cumulative streams, shared by bill_credit_fifo
#: and bill_dso_fifo (oracle side; the Spark twins are _fifo_invoices /
#: _fifo_payments below).
_FIFO_CTES = """inv AS (
  SELECT o_custkey AS cust, o_orderkey AS inv_id,
         CAST(o_orderdate AS DATE) AS inv_date,
         CAST(floor(o_totalprice * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents,
         SUM(CAST(floor(o_totalprice * 1e2 + CAST(0.5 AS DOUBLE))
                  AS BIGINT))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS inv_cum
  FROM orders WHERE o_custkey % 7 = 3
), pay AS (
  SELECT user_id AS cust, event_id AS pay_id, ts AS pts,
         CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS pc,
         SUM(CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pay_cum
  FROM events WHERE event_type = 'purchase' AND user_id % 7 = 3
)"""

_FIFO_ORACLE = f"""
WITH {_FIFO_CTES}
SELECT i.cust, i.inv_id, i.cents,
       CAST(COALESCE(SUM(CASE WHEN p.pay_id IS NULL THEN 0
                         ELSE LEAST(i.inv_cum, p.pay_cum)
                              - GREATEST(i.inv_cum - i.cents,
                                         p.pay_cum - p.pc) END), 0)
            AS BIGINT) AS alloc_cents,
       CAST(COUNT(p.pay_id) AS BIGINT) AS n_payments,
       COALESCE(MIN(CASE WHEN p.pay_cum >= i.inv_cum THEN p.pay_id END),
                CAST(-1 AS BIGINT)) AS completing_payment,
       CASE
         WHEN COALESCE(SUM(CASE WHEN p.pay_id IS NULL THEN 0
                           ELSE LEAST(i.inv_cum, p.pay_cum)
                                - GREATEST(i.inv_cum - i.cents,
                                           p.pay_cum - p.pc) END), 0)
              = i.cents THEN 'paid'
         WHEN COALESCE(SUM(CASE WHEN p.pay_id IS NULL THEN 0
                           ELSE LEAST(i.inv_cum, p.pay_cum)
                                - GREATEST(i.inv_cum - i.cents,
                                           p.pay_cum - p.pc) END), 0)
              > 0 THEN 'partial'
         ELSE 'unpaid'
       END AS status
FROM inv i
LEFT JOIN pay p
  ON i.cust = p.cust
 AND p.pay_cum > i.inv_cum - i.cents
 AND p.pay_cum - p.pc < i.inv_cum
GROUP BY i.cust, i.inv_id, i.cents
"""


def _fifo_invoices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invoice stream with the customer-lifetime cumulative cents — the
    deterministic %7 customer slice (the doc_id%97 benchmark-slice
    precedent) bounds the declared output while keeping every kept
    customer's FULL stream, and the modulo filter pushes into the
    scan."""
    oc = quantize_long("o_totalprice", 2)
    return (
        load(spark, sf_dir, "orders")
        .filter(F.expr("o_custkey % 7 = 3"))
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderkey").alias("inv_id"),
            F.col("o_orderdate").cast("date").alias("inv_date"),
            oc.alias("cents"),
            F.sum(oc)
            .over(
                Window.partitionBy("o_custkey").orderBy(
                    "o_orderdate", "o_orderkey"
                )
            )
            .alias("inv_cum"),
        )
    )


def _fifo_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payment stream with the customer-lifetime cumulative cents (same
    slice as the invoices)."""
    pc = quantize_long("value", 2)
    return (
        load(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase") & F.expr("user_id % 7 = 3")
        )
        .select(
            F.col("user_id").alias("pcust"),
            F.col("event_id").alias("pay_id"),
            F.col("ts").alias("pts"),
            pc.alias("pc"),
            F.sum(pc)
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("pay_cum"),
        )
    )


@query("bill_credit_fifo", oracle=_FIFO_ORACLE, tier=2)
def bill_credit_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO payment application — the accounts-receivable core: each
    customer's payments (the events purchase stream, in (ts, event_id)
    order) are applied oldest-invoice-first to their invoices (orders,
    in (date, key) order). Expressed as the classic cumulative-interval
    overlap: invoice i owns the range (inv_cum - amount, inv_cum] of the
    customer's lifetime billed cents, payment p owns (pay_cum - pc,
    pay_cum] of lifetime paid cents, and the cents p applies to i is the
    overlap length of the two intervals. Per invoice: total allocated,
    number of payments touching it, the payment that COMPLETED it (the
    pair-level fact that forces real FIFO matching — per-invoice totals
    alone would collapse to a closed form of the payment grand total),
    and paid/partial/unpaid status.

    Shape: two customer-keyed cumulative windows, then ONE equi-join on
    the customer key with the overlap range predicate — matched pairs
    per customer are O(n_inv + n_pay) because consecutive allocation
    intervals tile the cents line (every extra match crosses a boundary
    that is never re-crossed). At 100 TB the windows and the join all
    shuffle once on the same customer key; AQE handles whale-customer
    skew. All arithmetic is exact integer cents."""
    inv = _fifo_invoices(spark, sf_dir)
    pay = _fifo_payments(spark, sf_dir)
    # LEAST/GREATEST skip NULLs in BOTH engines (found by the round-11
    # FIFO replay test): an unmatched left-join row must allocate 0, not
    # collapse the overlap to the invoice's own interval
    alloc = F.expr(
        "CASE WHEN pay_id IS NULL THEN 0 ELSE LEAST(inv_cum, pay_cum)"
        " - GREATEST(inv_cum - cents, pay_cum - pc) END"
    )
    pairs = inv.join(
        pay,
        (inv.cust == pay.pcust)
        & (pay.pay_cum > inv.inv_cum - inv.cents)
        & (pay.pay_cum - pay.pc < inv.inv_cum),
        "left",
    )
    return pairs.groupBy("cust", "inv_id", "cents").agg(
        F.coalesce(F.sum(alloc), F.lit(0)).alias("alloc_cents"),
        F.count("pay_id").alias("n_payments"),
        F.coalesce(
            F.min(
                F.when(
                    F.col("pay_cum") >= F.col("inv_cum"), F.col("pay_id")
                )
            ),
            F.lit(-1).cast("long"),
        ).alias("completing_payment"),
        F.expr(
            "CASE WHEN COALESCE(SUM(CASE WHEN pay_id IS NULL THEN 0"
            " ELSE LEAST(inv_cum, pay_cum)"
            " - GREATEST(inv_cum - cents, pay_cum - pc) END), 0) = cents"
            " THEN 'paid'"
            " WHEN COALESCE(SUM(CASE WHEN pay_id IS NULL THEN 0"
            " ELSE LEAST(inv_cum, pay_cum)"
            " - GREATEST(inv_cum - cents, pay_cum - pc) END), 0) > 0"
            " THEN 'partial' ELSE 'unpaid' END"
        ).alias("status"),
    )


# --- bill_ltv_triangle -------------------------------------------------------

# Weekly cohort-LTV triangle (the events fixture spans one month, so the
# cohort axis is the ISO week): cumulative purchase revenue per user
# cohort by weeks-since-first-seen, with the cohort size alongside so
# LTV-per-user reads directly off the row.
_LTV_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
  FROM events GROUP BY user_id
), wk AS (
  SELECT u.cohort_week,
         (CAST(date_trunc('week', e.ts) AS DATE) - u.cohort_week) // 7
           AS age_n,
         CAST(floor(e.value * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM events e JOIN per_user u ON e.user_id = u.user_id
  WHERE e.event_type = 'purchase'
), cell AS (
  SELECT cohort_week, age_n, CAST(SUM(cents) AS BIGINT) AS wk_cents
  FROM wk GROUP BY cohort_week, age_n
), size_ AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM per_user GROUP BY cohort_week
)
SELECT c.cohort_week, CAST(c.age_n AS INTEGER) AS age_n, s.n_users,
       CAST(SUM(c.wk_cents) OVER (PARTITION BY c.cohort_week
                                  ORDER BY c.age_n) AS BIGINT)
         AS cum_cents,
       CAST(SUM(c.wk_cents) OVER (PARTITION BY c.cohort_week
                                  ORDER BY c.age_n) AS DOUBLE)
         / CAST(s.n_users AS DOUBLE) / 1e2 AS ltv_per_user
FROM cell c JOIN size_ s ON c.cohort_week = s.cohort_week
"""


@query("bill_ltv_triangle", oracle=_LTV_ORACLE, tier=2)
def bill_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: users cohorted by first-seen ISO
    week, with CUMULATIVE purchase revenue per cohort at each
    weeks-since-first-seen age, plus the cohort size and the
    LTV-per-user ratio — the payback-curve view finance reads next to
    the retention matrix (agg_retention_cohort is the same triangle
    counting users; this one accumulates their money). Ages with zero
    purchases for a cohort produce no cell; the running sum therefore
    steps only at observed ages, identically in both engines.

    Shape: ONE user-keyed aggregate pins each user's cohort week, the
    purchase stream joins to it on the user key (broadcast-eligible at
    fixture scale, co-keyed shuffle at 100 TB), and everything after
    runs on the O(weeks²) cell matrix — the cumulative window and the
    cohort-size join are model-sized at any corpus. Money is exact
    integer cents; the LTV division is shared-text."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.expr("CAST(date_trunc('week', ts) AS DATE)")).alias(
            "cohort_week"
        )
    )
    wk = (
        ev.filter(F.col("event_type") == "purchase")
        .join(per_user, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.expr("CAST(date_trunc('week', ts) AS DATE)"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("long")
            .alias("age_n"),
            quantize_long("value", 2).alias("cents"),
        )
    )
    cell = wk.groupBy("cohort_week", "age_n").agg(
        F.sum("cents").alias("wk_cents")
    )
    size = per_user.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    w = Window.partitionBy("cohort_week").orderBy("age_n")
    return (
        cell.join(size, "cohort_week")
        .select(
            "cohort_week",
            F.col("age_n").cast("int").alias("age_n"),
            "n_users",
            F.sum("wk_cents").over(w).alias("cum_cents"),
            (
                F.sum("wk_cents").over(w).cast("double")
                / F.col("n_users").cast("double")
                / F.lit(100.0)
            ).alias("ltv_per_user"),
        )
    )


# --- bill_dso_fifo -----------------------------------------------------------

# Days-sales-outstanding off the SAME FIFO allocation: an invoice's
# settlement date is the timestamp of the payment that completed it
# (the first payment whose cumulative covers the invoice's interval
# end), so DSO inherits bill_credit_fifo's pair semantics rather than
# re-inventing a matching rule.
_DSO_ORACLE = f"""
WITH {_FIFO_CTES},
per_inv AS (
  SELECT i.cust, i.inv_id, i.inv_date, i.cents,
         MIN(CASE WHEN p.pay_cum >= i.inv_cum THEN p.pts END)
           AS completing_ts
  FROM inv i
  LEFT JOIN pay p
    ON i.cust = p.cust
   AND p.pay_cum > i.inv_cum - i.cents
   AND p.pay_cum - p.pc < i.inv_cum
  GROUP BY i.cust, i.inv_id, i.inv_date, i.cents
), d AS (
  SELECT strftime(inv_date, '%Y-%m') AS inv_month, cents,
         CASE WHEN completing_ts IS NULL THEN NULL
              ELSE CAST(completing_ts AS DATE) - inv_date END AS days
  FROM per_inv
)
SELECT inv_month,
       CAST(COUNT(*) AS BIGINT) AS n_invoices,
       CAST(COUNT(days) AS BIGINT) AS n_paid,
       CASE WHEN COUNT(days) = 0 THEN CAST(-1 AS DOUBLE)
            ELSE CAST(SUM(days) AS DOUBLE) / CAST(COUNT(days) AS DOUBLE)
       END AS avg_days_to_pay,
       CASE WHEN COUNT(days) = 0 THEN CAST(-1 AS DOUBLE)
            ELSE CAST(SUM(CASE WHEN days IS NULL THEN NULL
                               ELSE days * cents END) AS DOUBLE)
                 / CAST(SUM(CASE WHEN days IS NULL THEN NULL
                                 ELSE cents END) AS DOUBLE)
       END AS dso_weighted
FROM d GROUP BY inv_month
"""


@query("bill_dso_fifo", oracle=_DSO_ORACLE, tier=2)
def bill_dso_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days-sales-outstanding by invoice month — THE accounts-receivable
    health metric, derived from the same FIFO application
    bill_credit_fifo performs (shared stream helpers, shared oracle
    CTEs): an invoice settles at the timestamp of the payment that
    completed its cumulative interval, days-to-pay is the calendar gap
    from invoice date to that settlement, and the month rollup reports
    plain and amount-weighted DSO over the settled invoices (unsettled
    ones count in n_invoices and are sentinel −1 when a month settles
    nothing — right-censoring made explicit, never silently dropped).

    Shape: identical to bill_credit_fifo up to the per-invoice
    aggregate (two customer-keyed windows + one overlap-bounded equi-
    join), then a calendar-keyed rollup whose key space is months. Days
    are exact integers; the two DSO ratios are shared-text divisions."""
    inv = _fifo_invoices(spark, sf_dir)
    pay = _fifo_payments(spark, sf_dir)
    pairs = inv.join(
        pay,
        (inv.cust == pay.pcust)
        & (pay.pay_cum > inv.inv_cum - inv.cents)
        & (pay.pay_cum - pay.pc < inv.inv_cum),
        "left",
    )
    per_inv = pairs.groupBy("cust", "inv_id", "inv_date", "cents").agg(
        F.min(
            F.when(F.col("pay_cum") >= F.col("inv_cum"), F.col("pts"))
        ).alias("completing_ts")
    )
    d = per_inv.select(
        F.date_format("inv_date", "yyyy-MM").alias("inv_month"),
        "cents",
        F.when(
            F.col("completing_ts").isNotNull(),
            F.datediff(F.col("completing_ts").cast("date"), F.col("inv_date")),
        ).alias("days"),
    )
    return d.groupBy("inv_month").agg(
        F.count(F.lit(1)).alias("n_invoices"),
        F.count("days").alias("n_paid"),
        F.expr(
            "CASE WHEN COUNT(days) = 0 THEN CAST(-1 AS DOUBLE)"
            " ELSE CAST(SUM(days) AS DOUBLE) / CAST(COUNT(days) AS DOUBLE)"
            " END"
        ).alias("avg_days_to_pay"),
        F.expr(
            "CASE WHEN COUNT(days) = 0 THEN CAST(-1 AS DOUBLE)"
            " ELSE CAST(SUM(CASE WHEN days IS NULL THEN NULL"
            " ELSE days * cents END) AS DOUBLE)"
            " / CAST(SUM(CASE WHEN days IS NULL THEN NULL"
            " ELSE cents END) AS DOUBLE) END"
        ).alias("dso_weighted"),
    )


# --- bill_usage_commitment -----------------------------------------------------

#: Committed-use contract terms, derived deterministically per user:
#: monthly committed units, the discounted per-unit commit rate, and the
#: premium per-unit overage rate (cents). Unused committed units expire
#: at month end (no rollover) — the simple form every committed-use
#: discount (CUD) bill computes first.
_UC_COMMIT_UNITS = "(50 * (1 + user_id % 4))"
_UC_COMMIT_RATE = 80
_UC_OVERAGE_RATE = 125

_USAGE_COMMIT_ORACLE = f"""
WITH usage_ AS (
  SELECT strftime(ts, '%Y-%m') AS month,
         user_id,
         CAST(COUNT(*) AS BIGINT) AS used_units,
         CAST({_UC_COMMIT_UNITS} AS BIGINT) AS commit_units
  FROM events GROUP BY month, user_id
), rated AS (
  SELECT month, used_units, commit_units,
         commit_units * {_UC_COMMIT_RATE} AS commit_cents,
         CASE WHEN used_units > commit_units
              THEN (used_units - commit_units) * {_UC_OVERAGE_RATE}
              ELSE 0 END AS overage_cents,
         CASE WHEN used_units < commit_units
              THEN commit_units - used_units ELSE 0 END AS expired_units
  FROM usage_
)
SELECT month,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(used_units) AS BIGINT) AS used_units,
       CAST(SUM(commit_cents) AS BIGINT) AS commit_cents,
       CAST(SUM(overage_cents) AS BIGINT) AS overage_cents,
       CAST(SUM(CASE WHEN overage_cents > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS users_over_commit,
       CAST(SUM(expired_units) AS BIGINT) AS expired_units
FROM rated GROUP BY month
"""


@query("bill_usage_commitment", oracle=_USAGE_COMMIT_ORACLE, tier=2)
def bill_usage_commitment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Committed-use billing (the CUD / reserved-capacity rating model):
    each user commits to a monthly unit volume at a discounted rate
    ({_UC_COMMIT_RATE}c vs {_UC_OVERAGE_RATE}c per unit); the commit is
    billed in full whether used or not, usage beyond it rates at the
    overage premium, and unused committed units EXPIRE (no rollover).
    Per month: users, usage, committed revenue, overage revenue, how
    many users blew through their commit (the upsell signal), and the
    expired-unit volume (the over-provisioning signal finance watches).
    Complements bill_tiered_rating: tiers price marginal units ever
    cheaper, commitments price a floor the customer pays regardless.

    Shape: ONE (month, user) counting aggregate over the event stream —
    full map-side combine, shuffle keyed on the natural billing grain —
    then per-row contract arithmetic (the terms derive from the user
    key; a real deployment broadcast-joins a contract dim of the same
    width) and a calendar-sized month rollup. Every money/unit figure
    is an exact integer; there are no doubles anywhere."""
    ev = load(spark, sf_dir, "events")
    usage = ev.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month"), "user_id"
    ).agg(F.count(F.lit(1)).alias("used_units"))
    rated = usage.select(
        "month",
        "used_units",
        F.expr(f"CAST({_UC_COMMIT_UNITS} AS BIGINT)").alias("commit_units"),
    ).select(
        "month",
        "used_units",
        "commit_units",
        (F.col("commit_units") * _UC_COMMIT_RATE).alias("commit_cents"),
        F.when(
            F.col("used_units") > F.col("commit_units"),
            (F.col("used_units") - F.col("commit_units")) * _UC_OVERAGE_RATE,
        )
        .otherwise(F.lit(0))
        .alias("overage_cents"),
        F.when(
            F.col("used_units") < F.col("commit_units"),
            F.col("commit_units") - F.col("used_units"),
        )
        .otherwise(F.lit(0))
        .alias("expired_units"),
    )
    return rated.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("used_units").alias("used_units"),
        F.sum("commit_cents").alias("commit_cents"),
        F.sum("overage_cents").alias("overage_cents"),
        F.sum(
            F.when(F.col("overage_cents") > 0, 1).otherwise(0)
        ).alias("users_over_commit"),
        F.sum("expired_units").alias("expired_units"),
    )


# --- bill_churn_rate ------------------------------------------------------------

_CHURN_ORACLE = """
WITH active AS (
  SELECT DISTINCT o_custkey AS cust,
         CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mi
  FROM orders
),
firsts AS (SELECT cust, MIN(mi) AS first_mi FROM active GROUP BY cust),
horizon AS (SELECT MAX(mi) AS max_mi FROM active),
marked AS (
  SELECT a.cust, a.mi,
         (n.cust IS NOT NULL) AS retained,
         (f.first_mi = a.mi) AS is_new
  FROM active a
  LEFT JOIN active n ON a.cust = n.cust AND n.mi = a.mi + 1
  JOIN firsts f ON a.cust = f.cust
)
SELECT m.mi AS month_idx,
       CAST(m.mi // 12 AS BIGINT) AS year,
       CAST(m.mi % 12 AS BIGINT) AS month0,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN m.retained THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       CAST(SUM(CASE WHEN m.retained THEN 0 ELSE 1 END) AS BIGINT)
         AS n_churned,
       CAST(SUM(CASE WHEN m.is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN m.retained THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS retention_rate,
       CAST(SUM(CASE WHEN m.retained THEN 0 ELSE 1 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS churn_rate,
       (m.mi = h.max_mi) AS is_censored
FROM marked m CROSS JOIN horizon h
GROUP BY m.mi, h.max_mi
"""


@query("bill_churn_rate", oracle=_CHURN_ORACLE, tier=2)
def bill_churn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly customer churn / retention / acquisition over the order
    stream — the subscription-health trio finance tracks month over
    month: a customer active in month m is RETAINED if they order again
    in m+1, CHURNED otherwise, and NEW if m is their first-ever active
    month. The final data month is flagged ``is_censored`` rather than
    silently reported as total churn (no m+1 exists to observe — the
    bill_dso_fifo right-censoring stance).

    Exactness: the month key is the integer year*12 + month - 1 index
    (the win_yoy_growth convention — ADVICE r12 fix: the earlier
    1-based encode decoded December into the NEXT year with month0=0;
    zero-based months make year = mi DIV 12 and month0 = mi % 12 exact
    for every month), every count is exact, and the two rates are
    shared-text IEEE divisions.

    Shape: one distinct over (cust, month) collapses the stream (the
    only data-sized exchange — activity grain, not order grain); the
    adjacency test is a cust-keyed equi self-join on mi+1 (co-keyed,
    hash join, never a band BNLJ); first-month is one cust-keyed MIN;
    the rollup key space is the calendar and the horizon fold is 1-row
    (EXPECTED_FLAGS)."""
    o = load(spark, sf_dir, "orders")
    active = (
        o.select(
            F.col("o_custkey").alias("cust"),
            F.expr(
                "CAST(EXTRACT(year FROM o_orderdate) * 12"
                " + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT)"
            ).alias("mi"),
        )
        .distinct()
    )
    from ..session import scoped_persist

    active = scoped_persist(active)
    firsts = active.groupBy("cust").agg(F.min("mi").alias("first_mi"))
    horizon = active.agg(F.max("mi").alias("max_mi"))
    nxt = active.select(
        F.col("cust").alias("n_cust"), F.col("mi").alias("n_mi")
    )
    marked = (
        active.join(
            nxt,
            (F.col("cust") == F.col("n_cust"))
            & (F.col("n_mi") == F.col("mi") + 1),
            "left",
        )
        .join(firsts, "cust")
        .select(
            "cust",
            "mi",
            F.col("n_cust").isNotNull().alias("retained"),
            (F.col("first_mi") == F.col("mi")).alias("is_new"),
        )
    )
    return (
        marked.crossJoin(F.broadcast(horizon))
        .groupBy("mi", "max_mi")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(F.expr("CASE WHEN retained THEN 1 ELSE 0 END")).alias(
                "n_retained"
            ),
            F.sum(F.expr("CASE WHEN retained THEN 0 ELSE 1 END")).alias(
                "n_churned"
            ),
            F.sum(F.expr("CASE WHEN is_new THEN 1 ELSE 0 END")).alias(
                "n_new"
            ),
            F.expr(
                "CAST(SUM(CASE WHEN retained THEN 1 ELSE 0 END) AS DOUBLE)"
                " / CAST(COUNT(*) AS DOUBLE)"
            ).alias("retention_rate"),
            F.expr(
                "CAST(SUM(CASE WHEN retained THEN 0 ELSE 1 END) AS DOUBLE)"
                " / CAST(COUNT(*) AS DOUBLE)"
            ).alias("churn_rate"),
        )
        .select(
            F.col("mi").alias("month_idx"),
            F.expr("CAST(mi DIV 12 AS BIGINT)").alias("year"),
            F.expr("CAST(mi % 12 AS BIGINT)").alias("month0"),
            "n_active",
            "n_retained",
            "n_churned",
            "n_new",
            "retention_rate",
            "churn_rate",
            (F.col("mi") == F.col("max_mi")).alias("is_censored"),
        )
    )


# --- bill_return_rate_monthly ---------------------------------------------------

_RETRATE_ORACLE = """
WITH li AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS mi,
         (l_returnflag = 'R') AS returned,
         CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100.0 + 0.5)
              AS BIGINT) AS price_cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT mi AS month_idx,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(CASE WHEN returned THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       CAST(SUM(price_cents) AS BIGINT) AS gross_cents,
       CAST(SUM(CASE WHEN returned THEN price_cents ELSE 0 END) AS BIGINT)
         AS returned_cents,
       CAST(SUM(CASE WHEN returned THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS return_rate_items,
       CAST(SUM(CASE WHEN returned THEN price_cents ELSE 0 END) AS DOUBLE)
         / CAST(NULLIF(SUM(price_cents), 0) AS DOUBLE)
         AS return_rate_value
FROM li
GROUP BY mi
"""


@query("bill_return_rate_monthly", oracle=_RETRATE_ORACLE, tier=2)
def bill_return_rate_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly return rate by item count AND by value — the
    revenue-quality metric finance reads next to the churn panel (a
    value rate far above the item rate means the EXPENSIVE items are
    the ones coming back): lineitems attribute to their order's month,
    returned = the 'R' return flag, and both rates are exact-count /
    exact-cent ratios.

    Exactness: the month key is the integer year*12+month index (the
    bill_churn_rate discipline); prices floor-quantize to integer
    cents; the two rates are shared-text IEEE divisions, NULLIF-guarded.

    Shape: the lineitem-orders join is the fact-to-fact equi-join on
    the order key (co-partitioned at 100 TB via the join_bucketed
    layout); the rollup key space is the calendar with full map-side
    combine — partial aggregation collapses essentially everything
    before the one exchange."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.expr(
            "CAST(EXTRACT(year FROM o_orderdate) * 12"
            " + EXTRACT(month FROM o_orderdate) AS BIGINT)"
        ).alias("mi"),
        (F.col("l_returnflag") == "R").alias("returned"),
        quantize_long("l_extendedprice", 2).cast("long").alias(
            "price_cents"
        ),
    )
    return j.groupBy(F.col("mi").alias("month_idx")).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(F.expr("CASE WHEN returned THEN 1 ELSE 0 END")).alias(
            "n_returned"
        ),
        F.sum("price_cents").alias("gross_cents"),
        F.sum(
            F.expr("CASE WHEN returned THEN price_cents ELSE 0 END")
        ).alias("returned_cents"),
        F.expr(
            "CAST(SUM(CASE WHEN returned THEN 1 ELSE 0 END) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE)"
        ).alias("return_rate_items"),
        F.expr(
            "CAST(SUM(CASE WHEN returned THEN price_cents ELSE 0 END)"
            " AS DOUBLE)"
            " / CAST(NULLIF(SUM(price_cents), 0) AS DOUBLE)"
        ).alias("return_rate_value"),
    )


# --- bill_survival_km -----------------------------------------------------------

#: Churn horizon guard: a customer is only judged churned if their last
#: order falls at least this many months before the data's end (orders
#: inside the guard band cannot prove churn yet — right-censoring).
_KM_GUARD_MONTHS = 2

_KM_ORACLE = f"""
WITH m AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS mi
  FROM orders
),
h AS (SELECT MAX(mi) - {_KM_GUARD_MONTHS} AS hc FROM m),
cust AS (
  SELECT o_custkey, MIN(mi) AS f, MAX(mi) AS l FROM m GROUP BY o_custkey
),
obs AS (
  SELECT c.o_custkey,
         CASE WHEN c.l <= h.hc THEN c.l - c.f ELSE h.hc - c.f END AS t,
         CASE WHEN c.l <= h.hc THEN 1 ELSE 0 END AS churned
  FROM cust c CROSS JOIN h
  WHERE c.f <= h.hc
),
per_t AS (
  SELECT t AS tau,
         CAST(SUM(churned) AS BIGINT) AS n_churned,
         CAST(COUNT(*) - SUM(churned) AS BIGINT) AS n_censored
  FROM obs GROUP BY t
),
risk AS (
  SELECT tau, n_churned, n_censored,
         CAST(SUM(n_churned + n_censored) OVER (
           ORDER BY tau DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_at_risk
  FROM per_t
),
lnq AS (
  SELECT tau, n_at_risk, n_churned, n_censored,
         CASE WHEN n_churned = n_at_risk THEN NULL
              ELSE CAST(floor(ln(CAST(n_at_risk - n_churned AS DOUBLE)
                                 / CAST(n_at_risk AS DOUBLE)) * 1e6
                              + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS lq,
         CASE WHEN n_churned = n_at_risk THEN 1 ELSE 0 END AS dead
  FROM risk
)
SELECT tau, n_at_risk, n_churned, n_censored,
       CAST(n_churned AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS hazard,
       CASE WHEN MAX(dead) OVER w = 1 THEN NULL
            ELSE CAST(SUM(lq) OVER w AS DOUBLE) / 1e6 END
         AS log_survival
FROM lnq
WINDOW w AS (ORDER BY tau
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("bill_survival_km", oracle=_KM_ORACLE, tier=3)
def bill_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier customer survival over lifetime months: each
    customer contributes an observation time (months from first to last
    order if churned, first order to the censor horizon otherwise) and
    a churn event flag; per lifetime month tau the at-risk count,
    churn/censor counts, the hazard d/n, and the KM LOG-survival
    ln S(tau) = sum over u <= tau of ln(1 - d_u/n_u) — the retention
    curve with right-censoring done properly (bill_churn_rate's naive
    monthly rate treats not-yet-churned customers as alive forever; KM
    is the standard fix). Log-survival is emitted instead of S itself
    so no exp() ever runs (engines' libm exp is unpinned; ln at the 1e6
    grid is the validated ext_zipf_fit stance). S(tau) = exp of the
    column, client-side.

    Exactness: all counts integer; the hazard is one shared-text
    division; each ln(1 - d/n) operand is a single division of exact
    integers and the value floor-quantizes at 1e6 before the cumulative
    sum; a saturated month (d == n) nulls the curve from there on
    (S = 0), propagated by a window MAX flag identically in both
    engines.

    Shape: one (customer) aggregate collapses orders — the only
    data-sized exchange; the lifetime rollup, reverse-cumulative
    at-risk window and KM fold all run on the O(max-lifetime-months)
    frame (~80 rows at any corpus size; EXPECTED_FLAGS)."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("mi"),
    )
    h = o.agg(
        (F.max("mi") - F.lit(_KM_GUARD_MONTHS)).alias("hc")
    )
    cust = o.groupBy("o_custkey").agg(
        F.min("mi").alias("f"), F.max("mi").alias("l")
    )
    obs = (
        cust.crossJoin(F.broadcast(h))
        .filter(F.col("f") <= F.col("hc"))
        .select(
            F.expr(
                "CASE WHEN l <= hc THEN l - f ELSE hc - f END"
            ).alias("t"),
            F.expr("CASE WHEN l <= hc THEN 1 ELSE 0 END").alias(
                "churned"
            ),
        )
    )
    per_t = obs.groupBy(F.col("t").alias("tau")).agg(
        F.sum("churned").alias("n_churned"),
        (F.count(F.lit(1)) - F.sum("churned")).alias("n_censored"),
    )
    risk = per_t.select(
        "tau",
        "n_churned",
        "n_censored",
        F.sum(F.col("n_churned") + F.col("n_censored"))
        .over(
            Window.orderBy(F.desc("tau")).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("n_at_risk"),
    )
    lnq = risk.select(
        "tau",
        "n_at_risk",
        "n_churned",
        "n_censored",
        F.expr(
            "CASE WHEN n_churned = n_at_risk THEN NULL"
            " ELSE CAST(floor(ln(CAST(n_at_risk - n_churned AS DOUBLE)"
            " / CAST(n_at_risk AS DOUBLE)) * 1e6"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT) END"
        ).alias("lq"),
        F.expr(
            "CASE WHEN n_churned = n_at_risk THEN 1 ELSE 0 END"
        ).alias("dead"),
    )
    w = Window.orderBy("tau").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return lnq.select(
        "tau",
        "n_at_risk",
        "n_churned",
        "n_censored",
        F.expr(
            "CAST(n_churned AS DOUBLE) / CAST(n_at_risk AS DOUBLE)"
        ).alias("hazard"),
        F.when(F.max("dead").over(w) == 1, F.lit(None)).otherwise(
            F.sum("lq").over(w).cast("double") / F.lit(1e6)
        ).alias("log_survival"),
    )


# --- bill_return_latency --------------------------------------------------------

_RETLAT_ORACLE = """
WITH ret AS (
  SELECT CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
              AS BIGINT) AS mi,
         CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
              AS BIGINT) AS days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
),
g AS (
  SELECT mi, days, CAST(COUNT(*) AS BIGINT) AS n FROM ret
  GROUP BY mi, days
),
c AS (
  SELECT mi, days, n,
         CAST(SUM(n) OVER (PARTITION BY mi ORDER BY days
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY mi) AS BIGINT) AS total
  FROM g
)
SELECT (mi // 12) * 100 + (mi % 12) + 1 AS ym,
       MAX(total) AS n_returns,
       MIN(days) AS min_days,
       MAX(days) AS max_days,
       MIN(CASE WHEN 2 * cum >= total THEN days END) AS p50_days,
       MIN(CASE WHEN 10 * cum >= 9 * total THEN days END) AS p90_days
FROM c GROUP BY mi
"""


@query("bill_return_latency", oracle=_RETLAT_ORACLE, tier=2)
def bill_return_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-latency distribution per order month: for returned line
    items ('R' flag), the days from order date to the item's ship date (the fixture carries l_shipdate; a receipt column drops in with a one-token swap), summarized
    as count, min/max, and exact integer-day p50/p90 — the
    reverse-logistics SLA read next to bill_return_rate_monthly's
    how-much (this is the how-slow; a drifting p90 flags a carrier or
    restocking problem months before the rate moves).

    Exactness: latency is an exact integer day difference; the
    percentiles are order statistics picked by integer
    cross-multiplication over the per-(month, days) cumulative weight
    (2*cum >= total, 10*cum >= 9*total — no interpolation, no float
    boundary; the agg_weighted_median discipline).

    Shape: the fact-to-fact order-key equi-join (co-partitioned via the
    join_bucketed layout at 100 TB), then ONE (month, days) aggregate
    with full combine — the exchange carries distinct latency values
    per month, not line items — and the percentile windows ride a
    month-keyed exchange over that bounded frame."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ret = li.join(o, li.l_orderkey == o.o_orderkey).select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("mi"),
        F.datediff("l_shipdate", "o_orderdate")
        .cast("long")
        .alias("days"),
    )
    g = ret.groupBy("mi", "days").agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.partitionBy("mi")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = g.select(
        "mi",
        "days",
        "n",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(Window.partitionBy("mi")).alias("total"),
    )
    return c.groupBy("mi").agg(
        F.max("total").alias("n_returns"),
        F.min("days").alias("min_days"),
        F.max("days").alias("max_days"),
        F.min(
            F.when(2 * F.col("cum") >= F.col("total"), F.col("days"))
        ).alias("p50_days"),
        F.min(
            F.when(10 * F.col("cum") >= 9 * F.col("total"), F.col("days"))
        ).alias("p90_days"),
    ).select(
        F.expr("(mi DIV 12) * 100 + (mi % 12) + 1").alias("ym"),
        "n_returns",
        "min_days",
        "max_days",
        "p50_days",
        "p90_days",
    )
