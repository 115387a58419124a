r"""Thermostat schedules beta(r) for the telegraph bridge.

Defines w_{t0,t1} = exp(-S * beta * \int_{t0}^{t1} beta_shape(r) dr), the decay
weight of the multivariate telegraph process (reference
`utils/thermostats.py:4-51`).  Pure jnp — safe inside jit/scan, fp32 math.
"""

from __future__ import annotations

import jax.numpy as jnp


class Thermostat:
    """Base thermostat: subclasses define the integral of beta_shape(r)."""

    def __init__(self, beta: float, vocab_size: int = 8):
        self.beta = float(beta)
        self.vocab_size = int(vocab_size)

    def _integral(self, t0, t1):
        raise NotImplementedError

    def w_ts(self, t0, t1):
        """w_{t0,t1} = exp(-S * beta * integral(t0, t1))."""
        t0 = jnp.asarray(t0, dtype=jnp.float32)
        t1 = jnp.asarray(t1, dtype=jnp.float32)
        return jnp.exp(-self.vocab_size * self.beta * self._integral(t0, t1))

    def wt_0(self, t):
        wt = self.w_ts(t, 1.0)
        return wt * self.vocab_size / (1.0 - wt)

    def wt_1(self, t):
        return self.w_ts(t, 1.0)


class ConstantThermostat(Thermostat):
    """beta(r) = const (the only schedule wired into the reference models,
    `model/MMF.py:28`)."""

    def _integral(self, t0, t1):
        return t1 - t0


class InverseThermostat(Thermostat):
    """beta(r) = 1/r."""

    def _integral(self, t0, t1):
        return jnp.log(t1 / t0)


class LinearThermostat(Thermostat):
    """beta(r) = r."""

    def _integral(self, t0, t1):
        return (t1**2 - t0**2) / 2.0


class InverseSquareThermostat(Thermostat):
    """beta(r) = -1/r^2."""

    def _integral(self, t0, t1):
        return (t1 - t0) / (t1 * t0)


class SigmoidThermostat(Thermostat):
    """beta(r) = 1/(1+r) (tanh-integral form, as in the reference)."""

    def _integral(self, t0, t1):
        return jnp.tanh(t1 / 2.0) - jnp.tanh(t0 / 2.0)


THERMOSTAT_REGISTRY = {
    "constant": ConstantThermostat,
    "inverse": InverseThermostat,
    "linear": LinearThermostat,
    "inverse_square": InverseSquareThermostat,
    "sigmoid": SigmoidThermostat,
}
