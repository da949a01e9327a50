"""TIPS interpolation-variant tests."""
import numpy as np

from pylbl_tpu.database.fixtures import synthetic_tips
from pylbl_tpu.models.tips import (TotalPartitionFunction, interp_uniform,
                                   interp_searchsorted)


def test_variants_agree_on_uniform_grid():
    t, q = synthetic_tips(num_iso=2)
    for temperature in [203.37, 279.54, 288.99, 296.0]:
        a = interp_uniform(t, q[0], temperature)
        b = interp_searchsorted(t, q[0], temperature)
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_uniform_matches_manual_linear():
    t, q = synthetic_tips(num_iso=1)
    temp = 279.54
    i = int(np.floor(temp)) - 1
    expected = q[0, i] + (q[0, i + 1] - q[0, i]) * (temp - t[i]) / (
        t[i + 1] - t[i])
    assert interp_uniform(t, q[0], temp) == expected


def test_total_partition_function_object():
    t, q = synthetic_tips(num_iso=3)
    tips = TotalPartitionFunction("H2O", t, q)
    assert tips.isotopologue == [0, 1, 2]
    v1 = tips.total_partition_function(279.54, 1)
    v2 = tips.total_partition_function(279.54, 1, variant="uniform")
    np.testing.assert_allclose(v1, v2, rtol=1e-12)


def test_batched_temperature():
    t, q = synthetic_tips(num_iso=2)
    temps = np.asarray([203.37, 288.99])
    rows = np.stack([q[0], q[0]])
    got = interp_uniform(t, rows, temps)
    expected = [interp_uniform(t, q[0], x) for x in temps]
    np.testing.assert_allclose(got, expected)
