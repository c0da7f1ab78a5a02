"""Unit tests: sigma schedules (noise_schedulers/sigma_calculator.py) and the
element registry (data/element_types.py).

Reference patterns: tests/noise_schedulers checks sigma(t) endpoints and
derivatives; ElementTypes pins the sorted-id convention every dataset and
checkpoint in the repo relies on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from diffusion_for_multi_scale_molecular_dynamics_tpu.data.element_types import (
    ElementTypes,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers.sigma_calculator import (
    exponential_sigma,
    exponential_sigma_time_derivative,
    get_sigma_functions,
    linear_sigma,
    linear_sigma_time_derivative,
)

SIGMA_MIN, SIGMA_MAX = 0.005, 0.5


class TestSigmaCalculators:
    def test_endpoints(self):
        for sigma in (exponential_sigma, linear_sigma):
            np.testing.assert_allclose(
                float(sigma(jnp.asarray(0.0), SIGMA_MIN, SIGMA_MAX)),
                SIGMA_MIN, rtol=1e-6,
            )
            np.testing.assert_allclose(
                float(sigma(jnp.asarray(1.0), SIGMA_MIN, SIGMA_MAX)),
                SIGMA_MAX, rtol=1e-6,
            )

    @pytest.mark.parametrize(
        "sigma,derivative",
        [
            (exponential_sigma, exponential_sigma_time_derivative),
            (linear_sigma, linear_sigma_time_derivative),
        ],
    )
    def test_derivative_matches_finite_difference(self, sigma, derivative):
        times = jnp.linspace(0.05, 0.95, 7)
        h = 1e-4
        numeric = (
            np.asarray(sigma(times + h, SIGMA_MIN, SIGMA_MAX))
            - np.asarray(sigma(times - h, SIGMA_MIN, SIGMA_MAX))
        ) / (2 * h)
        analytic = np.asarray(derivative(times, SIGMA_MIN, SIGMA_MAX))
        np.testing.assert_allclose(analytic, numeric, rtol=1e-2)

    def test_g_squared_is_2_sigma_sigmadot(self):
        """g^2 = 2 sigma dsigma/dt (exploding_variance.py:53 in the reference)."""
        sigma_fn, sigma_dot_fn, g_squared_fn = get_sigma_functions(
            "exponential", SIGMA_MIN, SIGMA_MAX
        )
        times = jnp.linspace(0.1, 0.9, 5)
        np.testing.assert_allclose(
            np.asarray(g_squared_fn(times)),
            2.0 * np.asarray(sigma_fn(times)) * np.asarray(sigma_dot_fn(times)),
            rtol=1e-6,
        )

    def test_monotone_increasing(self):
        times = jnp.linspace(0.0, 1.0, 50)
        for sigma in (exponential_sigma, linear_sigma):
            values = np.asarray(sigma(times, SIGMA_MIN, SIGMA_MAX))
            assert (np.diff(values) > 0).all()


class TestElementTypes:
    def test_sorted_id_convention(self):
        """Ids follow sorted element names — Ge=0, Si=1 for ["Si", "Ge"]
        (the convention the SiGe dataset and SW tables rely on)."""
        registry = ElementTypes(["Si", "Ge"])
        assert registry.elements == ["Ge", "Si"]
        assert registry.get_element_id("Ge") == 0
        assert registry.get_element_id("Si") == 1
        assert registry.get_element(1) == "Si"
        assert registry.number_of_atom_types == 2
        assert registry.mask_id == 2

    def test_duplicate_elements_rejected(self):
        with pytest.raises(AssertionError):
            ElementTypes(["Si", "Si"])

    def test_reserved_names_rejected(self):
        for bad in (["NULL"], ["MASK"]):
            try:
                ElementTypes(bad)
            except AssertionError:
                continue
            # Only fail if neither name is actually reserved.
            from diffusion_for_multi_scale_molecular_dynamics_tpu.data.element_types import (
                MASK_ELEMENT,
                NULL_ELEMENT,
            )
            assert bad[0] not in (MASK_ELEMENT, NULL_ELEMENT)
