"""Cross-framework numerical parity: reference torch modules vs flax twins.

The installed torch (CPU) runs the reference source at /root/reference/src
as the oracle; identical weights are loaded into both frameworks and
forward outputs / losses / short training trajectories are asserted equal.
"""
