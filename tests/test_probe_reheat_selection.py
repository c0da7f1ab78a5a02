"""Final-tau selection for the empirical reheat probe.

The r3k Si 3x3x3 probe walked T_eff/T_data off a cliff (3.55 at tau=0.41 ->
0.084 at tau=0.33); the plain argmin picked the frozen side and the eval
sampled cold. select_noise_temperature interpolates the tightest bracket
in that case and falls back to the argmin everywhere else.
"""
import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments"
    ),
)

from probe_reheat import select_noise_temperature  # noqa: E402


def probe(tau, ratio):
    return {"tau": tau, "t_eff_over_t_data": ratio}


def test_argmin_when_a_probe_is_close():
    probes = [probe(1.0, 1.8), probe(0.8, 1.3), probe(0.64, 0.97)]
    tau, ratio, interpolated = select_noise_temperature(probes)
    assert (tau, ratio, interpolated) == (0.64, 0.97, False)


def test_r3k_cliff_interpolates_the_tight_bracket():
    # The recorded r3k Si 3x3x3 ladder (reheat_probe_si3x3x3_r3k.json).
    probes = [
        probe(1.0, 3.013),
        probe(0.8, 3.361),
        probe(0.64, 3.253),
        probe(0.512, 3.164),
        probe(0.4096, 3.553),
        probe(0.32768, 0.084),
    ]
    tau, ratio, interpolated = select_noise_temperature(probes)
    assert interpolated and ratio is None
    # Regula falsi on the (0.328, 0.41) bracket, not the frozen edge.
    assert 0.32768 < tau < 0.4096
    lo_t, lo_r, hi_t, hi_r = 0.32768, 0.084, 0.4096, 3.553
    expected = lo_t + (1.0 - lo_r) * (hi_t - lo_t) / (hi_r - lo_r)
    assert abs(tau - expected) < 1e-9


def test_no_bracket_returns_argmin():
    # All hot: nothing to interpolate, even though the best is far off.
    probes = [probe(1.0, 3.0), probe(0.8, 2.5), probe(0.64, 2.1)]
    tau, ratio, interpolated = select_noise_temperature(probes)
    assert (tau, ratio, interpolated) == (0.64, 2.1, False)


def test_non_monotone_ratio_refuses_to_interpolate():
    # A cold probe *hotter in tau* than a hot probe (frozen-in defects can
    # heat the median at cold tau): the "bracket" is inverted; trust argmin.
    probes = [probe(1.0, 0.6), probe(0.8, 2.0)]
    tau, ratio, interpolated = select_noise_temperature(probes)
    assert not interpolated
    assert tau == 1.0 and ratio == 0.6
