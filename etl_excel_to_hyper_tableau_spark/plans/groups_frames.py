"""GROUPS window frames + the EXCLUDE clause, emulated on Spark.

SQLite ≥3.28 (the reference's delegated SQL surface, SURVEY §2C) has
``GROUPS`` frame mode and the ``EXCLUDE`` clause; Spark has only
``ROWS``/``RANGE`` frames and no ``EXCLUDE``.  Both are exactly
expressible with what Spark does have:

* ``GROUPS BETWEEN a PRECEDING AND b FOLLOWING`` over ``ORDER BY k``
  ≡ ``RANGE BETWEEN a PRECEDING AND b FOLLOWING`` over ``ORDER BY g``
  where ``g = dense_rank() over (... order by k)`` — dense_rank
  collapses each peer group to one integer and adjacent groups to
  consecutive integers, so "n peer groups away" becomes "integer range
  distance n".
* ``EXCLUDE`` is frame arithmetic on two extra window aggregates (the
  peer-group sum/count come from a ``RANGE CURRENT ROW`` frame —
  range-mode current-row bounds span the whole peer group):

  - ``EXCLUDE CURRENT ROW``: frame − current value; NULL when the
    frame contains only the current row (SQL sum over an empty set).
  - ``EXCLUDE GROUP``: frame − peer-group; NULL when the frame is
    exactly the peer group.
  - ``EXCLUDE TIES``: frame − peer-group + current value (never an
    empty set — the current row always remains).

  The subtraction is exact when the aggregate runs on decimals, which
  is how every value-checked sum in this engine is computed anyway.

All three windows share the same partition key, so Catalyst plans ONE
exchange; the dense_rank pass adds a second sort but no second shuffle.
At 100 TB this costs the same as any window aggregate: one shuffle on
the partition key (skew bounded by partition-key cardinality, as for
any window function — not by frame width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DEC = "__gf_dec__"
_SF = "__gf_s_frame__"
_NF = "__gf_n_frame__"
_SG = "__gf_s_grp__"
_NG = "__gf_n_grp__"


def with_groups_frame(df: DataFrame, partition_cols: list[str],
                      order_col: str, value_col: str,
                      preceding: int = 1, following: int = 1,
                      scale: str = "decimal(28,4)") -> DataFrame:
    """Attach GROUPS-frame aggregate columns for
    ``sum(value_col) OVER (PARTITION BY partition_cols ORDER BY
    order_col GROUPS BETWEEN preceding PRECEDING AND following
    FOLLOWING [EXCLUDE ...])``:

    ``grp``            dense_rank of the row's peer group (int)
    ``s_frame``        frame sum (decimal; EXCLUDE NO OTHERS)
    ``n_frame``        frame row count
    ``s_excl_current`` frame sum EXCLUDE CURRENT ROW (NULL if empty)
    ``s_excl_group``   frame sum EXCLUDE GROUP (NULL if empty)
    ``s_excl_ties``    frame sum EXCLUDE TIES
    """
    wp = Window.partitionBy(*partition_cols)
    out = (df
           .withColumn(_DEC, F.col(value_col).cast(scale))
           .withColumn("grp", F.dense_rank().over(wp.orderBy(order_col))))
    wg = wp.orderBy("grp").rangeBetween(-preceding, following)
    # RANGE CURRENT ROW..CURRENT ROW == the full peer group, any order type
    wpeer = wp.orderBy(order_col).rangeBetween(Window.currentRow,
                                               Window.currentRow)
    out = (out
           .withColumn(_SF, F.sum(_DEC).over(wg))
           .withColumn(_NF, F.count("*").over(wg))
           .withColumn(_SG, F.sum(_DEC).over(wpeer))
           .withColumn(_NG, F.count("*").over(wpeer)))
    s_excl_current = (F.when(F.col(_NF) == 1, F.lit(None))
                      .otherwise(F.col(_SF) - F.col(_DEC)))
    s_excl_group = (F.when(F.col(_NF) == F.col(_NG), F.lit(None))
                    .otherwise(F.col(_SF) - F.col(_SG)))
    s_excl_ties = F.col(_SF) - F.col(_SG) + F.col(_DEC)
    return (out
            .withColumn("s_frame", F.col(_SF))
            .withColumn("n_frame", F.col(_NF))
            .withColumn("s_excl_current", s_excl_current)
            .withColumn("s_excl_group", s_excl_group)
            .withColumn("s_excl_ties", s_excl_ties)
            .drop(_DEC, _SF, _NF, _SG, _NG))
