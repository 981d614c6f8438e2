"""Adversarial magnitude sweep: run registered queries against their
registered oracles on random frames spanning value regimes up to ±1e9.

    python tools/magnitude_sweep.py [--trials 16] [--seed 99] [query ...]

The cross-engine numeric classes this hunts (all found live by it in
r11) live at MAGNITUDE boundaries the fixed-seed sf tables never reach:

* scale-d double→DECIMAL casts stop being engine-exact past
  |x|·10^d > 2^53 (Spark casts via the shortest-17-digit string, DuckDB
  by binary scaling) — the brown_forsythe z / cuped mean / page_hinkley
  cumulative-deviation findings;
* wide-decimal→double casts double-round in DuckDB past scaled 2^53
  (int128 cast then 10^-scale divide) — the dec_double class;
* ANSI long-floor overflow when corpus-sized factors multiply inside a
  double before scaled-integer rounding.

Each trial alternates an extreme regime (±1e9 with zero-inflation) and a
moderate one (±9e5). A failure prints the falsifying series — pin it as
an @example in the operator's property test after fixing.

Run this over EVERY member the r12 rotation touches BEFORE the new
window freezes (the r11 closing checklist; page_hinkley is the known
open member, frozen until rotation — it sits in KNOWN_DIVERGING so the
default run's exit code still gates NEW regressions)."""

from __future__ import annotations

import argparse
import os
import random
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


# members with a KNOWN open divergence that cannot be fixed yet (frozen
# window): reported as KNOWN, never failing the exit code, so the default
# run remains a meaningful regression gate. Remove on fix at rotation.
KNOWN_DIVERGING: dict[str, str] = {
    # r12 rotation: both r11 entries fixed and removed —
    # page_hinkley moved to the grid-6/(28,6) running-mean discipline
    # (16/16), gumbel's s/ss decimal→double casts moved to the dec_double
    # string round-trip (16/16).
}


def registry():
    """query name -> (series -> {table: pa.Table}) builders. Extend as
    operators join the sweep; series are floats, builders reshape."""
    from test_r11b_sweep_properties import (
        _customer_nation_tables,
        _events_table_types,
        _orders_table_classes,
    )
    from test_r11c_new_ops import _events_table_lifecycle

    customer, nation = _customer_nation_tables()

    def ev(series):
        return {"events": _events_table_types(series)}

    def ev_life(series):
        return {"events": _events_table_lifecycle(series)}

    def orders(series):
        return {"orders": _orders_table_classes([abs(v) for v in series])}

    def spend(series):
        return {
            "orders": _orders_table_classes([abs(v) for v in series]),
            "customer": customer,
            "nation": nation,
        }

    return {
        "brown_forsythe_value_by_type": ev,
        "cuped_adjusted_value_ab": ev,
        "wilcoxon_signed_rank_user_halves": ev,
        "friedman_value_by_type_blocks": ev,
        "wasserstein_value_drift_by_type": ev,
        "bowley_moors_value_by_type": ev,
        "gumbel_return_level_by_type": ev,
        "page_hinkley_value_by_type": ev,
        "log_rank_conversion_by_variant": ev_life,
        "mcnemar_paired_conversion": ev_life,
        "jonckheere_price_by_priority": orders,
        "theil_decomposition_spend": spend,
        "lorenz_curve_spend_by_nation": spend,
        # older below-window members (r11 extension of the registry —
        # anything found here is immediately fixable)
        "spearman_value_hour_by_type": ev,
        "winsorized_mean_value_by_type": ev,
        "twap_value_by_type": ev,
        "kendall_tau_level_volume_by_type": ev,
        "cusum_changepoint_by_type": ev,
        "theil_sen_trend_by_type": ev,
        "burstiness_daily_by_type": ev,
        "next_event_entropy_by_type": ev,
        "trimmed_mean_value_by_type": ev,
        "holt_forecast_by_type": ev,
        "mann_kendall_trend_by_type": ev,
        "seasonal_strength_value_by_type": ev,
        "autocorr_lag1_value_by_type": ev,
        "gini_customer_spend_by_nation": spend,
        "survival_conversion_curve": ev_life,
        "interarrival_stats_by_type": ev,
        "trend_value_by_type": ev,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=16)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from test_r11_cross_engine_properties import _run_query_vs_oracle

    from smart_data_lake_spark.session import build_session

    spark = build_session(app_name="magnitude_sweep")
    reg = registry()
    names = args.queries or sorted(reg)
    unknown = [n for n in names if n not in reg]
    if unknown:
        print(f"not in the sweep registry: {unknown}", file=sys.stderr)
        return 2
    rc = 0
    for name in names:
        # per-query seed: a subset rerun reproduces the exact trials of
        # the full sweep (r11 review — a shared sequential RNG made
        # failures non-reproducible in isolation)
        rng = random.Random(f"{args.seed}:{name}")
        ok, first = 0, None
        for trial in range(args.trials):
            n = rng.randint(4, 24)
            mode = trial % 3
            if mode == 0:
                series = [rng.uniform(-1e9, 1e9) * rng.choice([0, 1, 1]) for _ in range(n)]
            elif mode == 1:
                series = [rng.uniform(-9e5, 9e5) for _ in range(n)]
            else:
                # rate-scale regime: absolute-grid precision loss hides here
                series = [rng.uniform(0.0, 1.0) for _ in range(n)]
            try:
                _run_query_vs_oracle(spark, name, reg[name](series))
                ok += 1
            except Exception as exc:  # noqa: BLE001
                if first is None:
                    first = (series, f"{type(exc).__name__}: {str(exc)[:200]}")
        known = name in KNOWN_DIVERGING
        status = "OK   " if ok == args.trials else ("KNOWN" if known else "DIVERGES")
        print(f"{status} {name} {ok}/{args.trials}")
        if first is not None:
            if not known:
                rc = 1
            print(f"    first falsifying series: {first[0]}")
            print(f"    {first[1]}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
