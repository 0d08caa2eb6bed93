"""Golden-constant tests for the shared curve interiors.

The GTFS differential oracles (gtfs_statistics, gtfs_predictions,
journey_transfers, lsh/ivf) share ``curves/core.py`` between engine and
oracle, so an interior bug would pass both sides unnoticed.  These tests
pin the reference semantics (make_curve src/analyser/curve_utils.rs:68-94,
simplify, convolution src/monitor/time_curve.rs:34-77) with literal
expected arrays derived BY HAND in the comments — they fail if the shared
math drifts, independent of any oracle.

All chosen inputs keep every intermediate value dyadic (exactly
representable in float64), so the expectations are exact, not tolerances.
"""

from __future__ import annotations

import numpy as np
import pytest

from dystonse_gtfs_data_spark.curves.core import (
    Curve,
    convolve_cdfs,
    make_curve,
    simplify,
    transfer_probability,
)


class TestMakeCurveGoldens:
    def test_unweighted_ecdf_with_duplicate(self):
        # values [10,20,20,40], no focus: weights 1 each, total 4,
        # cumsum [1,2,3,4].  The reference pushes a point at the FIRST
        # occurrence of each distinct x (curve_utils.rs:77-84: i += w
        # happens per row, but the push fires on x != last_x, so a
        # duplicate's weight rolls into the NEXT distinct x): points at
        # 10,20,40 carry cumulative weights 1,2,4 -> ys [.25,.5,1.0];
        # then first y pinned to 0 and last to 1 -> [0.0, 0.5, 1.0].
        curve, total = make_curve([10.0, 20.0, 20.0, 40.0])
        assert total == 4.0
        np.testing.assert_array_equal(curve.xs, [10.0, 20.0, 40.0])
        np.testing.assert_array_equal(curve.ys, [0.0, 0.5, 1.0])

    def test_leading_zero_quirk(self):
        # reference initializes last_x = 0.0, silently skipping a leading
        # x == 0 point while its weight still counts: values [0,5,9] ->
        # cum/total [1/3,2/3,1] at xs [0,5,9]; drop x=0 -> xs [5,9],
        # ys [2/3,1] -> pinned [0.0, 1.0].
        curve, total = make_curve([0.0, 5.0, 9.0])
        assert total == 3.0
        np.testing.assert_array_equal(curve.xs, [5.0, 9.0])
        np.testing.assert_array_equal(curve.ys, [0.0, 1.0])

    def test_triangular_focus_weights(self):
        # values [10,20,30], focus 20: triangular weights [0,1,0]
        # (linear 0 at min/max, 1 at focus), total 1, cumsum [0,1,1] ->
        # ys [0,1,1] -> pinned first/last -> [0.0, 1.0, 1.0].
        curve, total = make_curve([10.0, 20.0, 30.0], focus=20.0)
        assert total == 1.0
        np.testing.assert_array_equal(curve.xs, [10.0, 20.0, 30.0])
        np.testing.assert_array_equal(curve.ys, [0.0, 1.0, 1.0])

    def test_too_few_points_returns_none(self):
        assert make_curve([7.0, 7.0, 7.0]) is None  # one distinct x
        assert make_curve([]) is None


class TestSimplifyGoldens:
    def test_collinear_collapses_to_endpoints(self):
        # perfectly linear CDF: every interior point reproducible by the
        # chord -> only endpoints survive any epsilon.
        c = simplify(
            Curve([0.0, 10.0, 20.0, 30.0, 40.0], [0.0, 0.25, 0.5, 0.75, 1.0]),
            0.001,
        )
        np.testing.assert_array_equal(c.xs, [0.0, 40.0])
        np.testing.assert_array_equal(c.ys, [0.0, 1.0])

    def test_rdp_keeps_the_knee(self):
        # ys [0,.1,.8,.9,1] at xs [0,10,20,30,40], eps .05:
        #   chord (0,0)-(40,1): errors at 10/20/30 = .15/.3/.15 -> keep 20
        #   chord (0,0)-(20,.8): error at 10 = |.1-.4| = .3  -> keep 10
        #   chord (20,.8)-(40,1): error at 30 = |.9-.9| = 0  -> drop 30
        c = simplify(
            Curve([0.0, 10.0, 20.0, 30.0, 40.0], [0.0, 0.1, 0.8, 0.9, 1.0]),
            0.05,
        )
        np.testing.assert_array_equal(c.xs, [0.0, 10.0, 20.0, 40.0])
        np.testing.assert_array_equal(c.ys, [0.0, 0.1, 0.8, 1.0])


class TestConvolveGolden:
    def test_two_flat_curves(self):
        # f = g = uniform CDF on [-12, 12].  Hand-derivation:
        #   x_at_y(.01) = -11.76, x_at_y(.99) = 11.76
        #   min_n = floor(-23.52) = -24, max_n = ceil(23.52) = 24
        #   step = max(12, 48//200*2) = 12, half = 6
        #   padded: min_n=-36, max_n=36; ks from int(-12)-12=-24 to
        #   ceil(12)+12=24 -> ns=[-36..24] step 12, ks=[-24,-12,0,12]
        #   pmf(d) = y(d+6)-y(d-6) = .25/.5/.25 at d=-12/0/12, else 0
        #   contrib(n) = sum_k pmf(n-k)*pmf_g(k):
        #     [-36:0, -24:.0625, -12:.25, 0:.375, 12:.25, 24:.0625]
        #   cumsum = [0,.0625,.3125,.6875,.9375,1.0]
        #   raw curve: (-48,0) head, points above, (48,1) tail
        #   simplify(.05): keeps (12,.9375) (max err .3125), then
        #   (-24,.0625) (err .3125 on the left chord); -36, -12, 0, 24
        #   all fall within .05 of their chords -> dropped.
        # Every value is dyadic -> exact float64 equality.
        f = Curve([-12.0, 12.0], [0.0, 1.0])
        g = Curve([-12.0, 12.0], [0.0, 1.0])
        c = convolve_cdfs(f, g)
        np.testing.assert_array_equal(c.xs, [-48.0, -24.0, 12.0, 48.0])
        np.testing.assert_array_equal(c.ys, [0.0, 0.0625, 0.9375, 1.0])


class TestTransferProbabilityGolden:
    def test_half_overlapping_uniform(self):
        # arrival uniform on [-12,12], departure uniform on [0,24]:
        # arr_times(p) = -12+24p; miss = max(0, p-.5);
        # mean over p = 0,.01,...,.99 of (p-.5)+ = (sum i/100, i=0..49)/100
        #             = 12.25/100 = .1225 -> P = .8775
        arrival = Curve([-12.0, 12.0], [0.0, 1.0])
        departure = Curve([0.0, 24.0], [0.0, 1.0])
        assert transfer_probability(arrival, departure) == pytest.approx(
            0.8775, abs=1e-12
        )

    def test_impossible_and_guaranteed(self):
        arrival = Curve([-12.0, 12.0], [0.0, 1.0])
        # departure long gone before any arrival -> always missed
        assert transfer_probability(arrival, Curve([-100.0, -50.0], [0.0, 1.0])) == 0.0
        # departure far in the future -> always made
        assert transfer_probability(arrival, Curve([100.0, 200.0], [0.0, 1.0])) == 1.0
