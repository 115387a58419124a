from multimodal_flows_tpu.dynamics.thermostats import (
    ConstantThermostat,
    InverseSquareThermostat,
    InverseThermostat,
    LinearThermostat,
    SigmoidThermostat,
    Thermostat,
    THERMOSTAT_REGISTRY,
)
from multimodal_flows_tpu.dynamics.bridges import RandomTelegraphBridge, UniformFlow
from multimodal_flows_tpu.dynamics import solvers

__all__ = [
    "Thermostat",
    "ConstantThermostat",
    "InverseThermostat",
    "LinearThermostat",
    "InverseSquareThermostat",
    "SigmoidThermostat",
    "THERMOSTAT_REGISTRY",
    "UniformFlow",
    "RandomTelegraphBridge",
    "solvers",
]
