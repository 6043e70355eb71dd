"""k-anonymity / l-diversity audit (operators/privacy.py)."""

from __future__ import annotations

import pytest

from reddit_etl_spark.operators.privacy import k_anonymity_report


class TestKAnonymityReport:
    def test_hand_computed_groups(self, spark):
        rows = [
            # QI group (a, 1): 3 rows, sensitive {x, y} -> l=2
            ("a", 1, "x"), ("a", 1, "x"), ("a", 1, "y"),
            # QI group (a, 2): 1 row, sensitive {x} -> l=1 (homogeneous)
            ("a", 2, "x"),
            # QI group (b, 1): 2 rows, sensitive {x, NULL} -> l=2
            ("b", 1, "x"), ("b", 1, None),
        ]
        df = spark.createDataFrame(rows, "q1 string, q2 long, s string")
        got = {
            r["k_threshold"]: r
            for r in k_anonymity_report(
                df, ["q1", "q2"], "s", thresholds=(2, 3)
            ).collect()
        }
        r2, r3 = got[2], got[3]
        assert r2["n_groups"] == 3 and r2["min_group_size"] == 1
        assert r2["violating_groups"] == 1 and r2["violating_rows"] == 1
        assert r2["pct_rows_at_risk"] == round(1 / 6, 6)
        assert r3["violating_groups"] == 2 and r3["violating_rows"] == 3
        # homogeneity + NULL-as-value diversity
        assert r2["homogeneous_groups"] == 1
        assert r2["min_l"] == 1

    def test_null_qi_is_its_own_group_and_validation(self, spark):
        rows = [(None, "x"), (None, "y"), ("a", "x")]
        df = spark.createDataFrame(rows, "q string, s string")
        got = k_anonymity_report(df, ["q"], "s", thresholds=(2,)).collect()[0]
        assert got["n_groups"] == 2
        assert got["min_group_size"] == 1  # the ('a',) group
        with pytest.raises(ValueError):
            k_anonymity_report(df, [], "s")
        with pytest.raises(ValueError):
            k_anonymity_report(df, ["q"], "s", thresholds=(0,))
