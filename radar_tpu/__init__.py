"""radar_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the RADAR multimodal-radiology reference."""

__version__ = "0.1.0"
