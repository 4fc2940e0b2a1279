"""Market-basket association mining (SURVEY.md §2 extensions, round 11):
support / confidence / lift rules over order baskets — the co-purchase
analysis a retail/billing warehouse feeds into recommendations and
bundle pricing.

Scale stance: pair candidates generate MAP-SIDE from each basket's
sorted distinct-item array (the minhash-LSH combinatoric pattern —
never a basket self-join, which is quadratic in basket count), and the
aggregate key space is the item-pair domain (bounded by the catalog,
never by orders). All rule metrics are ratios of exact long counts with
shared-text divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..session import scoped_persist
from ..tables import load

# --- ext_assoc_rules ---------------------------------------------------------

#: Minimum support as an exact integer predicate: a pair qualifies iff
#: 50 * n_ab >= n_baskets (support >= 2%) — integer compare, no float
#: threshold that could flip on an engine ulp.
_MINSUP_MUL = 50

_ASSOC_ORACLE = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS basket, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
), n AS (
  SELECT COUNT(DISTINCT basket) AS n_baskets FROM b
), items AS (
  SELECT item, COUNT(*) AS cnt FROM b GROUP BY item
), pairs AS (
  SELECT x.item AS a, y.item AS bb, COUNT(*) AS n_ab
  FROM b x JOIN b y ON x.basket = y.basket AND x.item < y.item
  GROUP BY x.item, y.item
), dir_ AS (
  SELECT a AS antecedent, bb AS consequent, n_ab FROM pairs
  UNION ALL
  SELECT bb AS antecedent, a AS consequent, n_ab FROM pairs
)
SELECT antecedent, consequent,
       CAST(n_ab AS BIGINT) AS n_ab,
       CAST(ia.cnt AS BIGINT) AS n_ante,
       CAST(ic.cnt AS BIGINT) AS n_cons,
       CAST(n_ab AS DOUBLE) / CAST(n.n_baskets AS DOUBLE) AS support,
       CAST(n_ab AS DOUBLE) / CAST(ia.cnt AS DOUBLE) AS confidence,
       (CAST(n_ab AS DOUBLE) * CAST(n.n_baskets AS DOUBLE))
         / (CAST(ia.cnt AS DOUBLE) * CAST(ic.cnt AS DOUBLE)) AS lift
FROM dir_
JOIN items ia ON dir_.antecedent = ia.item
JOIN items ic ON dir_.consequent = ic.item
CROSS JOIN n
WHERE {_MINSUP_MUL} * n_ab >= n.n_baskets
"""


@query("ext_assoc_rules", oracle=_ASSOC_ORACLE, tier=3)
def ext_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets (brand co-purchase):
    for every directed rule A -> B above 2% support, its support,
    confidence, and lift — the classic Agrawal market-basket output a
    recommendation/bundling pipeline consumes. The support threshold is
    an exact integer predicate (50·n_ab >= n_baskets), so rule
    membership can never flip on a float ulp.

    Shape: baskets collapse to sorted distinct-item arrays in ONE
    orderkey-keyed aggregate, and every pair candidate generates
    MAP-SIDE from the array combinatorics (the minhash-LSH pattern — the
    oracle's basket self-join is the naive quadratic form this operator
    exists to avoid). Item and pair counts both aggregate on
    catalog-bounded key spaces; the count frames broadcast back (25
    brands / <=300 pairs at any corpus size). All metrics are
    shared-text divisions of exact longs."""
    b = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(
                load(spark, sf_dir, "part").select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
    )
    # three consumers (basket total, item counts, pair counts) — persist
    # the reduced basket-array frame or the scan+join+aggregate pipeline
    # executes three times (the PCA multiple-reference lesson)
    sets = scoped_persist(
        b.groupBy("basket").agg(
            F.array_sort(F.collect_set("item")).alias("items")
        )
    )
    n = sets.agg(F.count(F.lit(1)).alias("n_baskets"))
    items = sets.select(F.explode("items").alias("item")).groupBy(
        "item"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # BOTH rule directions generate map-side from the same combination —
    # a post-aggregate two-branch union would re-execute the pair
    # aggregate once per direction
    directed = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (a, i) ->"
                    " flatten(transform(slice(items, i + 2, size(items)),"
                    " bb -> array(struct(a AS antecedent, bb AS consequent),"
                    " struct(bb AS antecedent, a AS consequent))))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ia = items.select(
        F.col("item").alias("ia_item"), F.col("cnt").alias("n_ante")
    )
    ic = items.select(
        F.col("item").alias("ic_item"), F.col("cnt").alias("n_cons")
    )
    return (
        directed.join(F.broadcast(ia), F.col("antecedent") == F.col("ia_item"))
        .join(F.broadcast(ic), F.col("consequent") == F.col("ic_item"))
        .crossJoin(F.broadcast(n))
        .filter(F.expr(f"{_MINSUP_MUL} * n_ab >= n_baskets"))
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            "n_ante",
            "n_cons",
            F.expr(
                "CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE)"
            ).alias("support"),
            F.expr(
                "CAST(n_ab AS DOUBLE) / CAST(n_ante AS DOUBLE)"
            ).alias("confidence"),
            F.expr(
                "(CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE))"
                " / (CAST(n_ante AS DOUBLE) * CAST(n_cons AS DOUBLE))"
            ).alias("lift"),
        )
    )
