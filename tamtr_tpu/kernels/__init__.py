"""Pallas TPU kernels for the hot ops.

`enable()` switches the SS2D selective scan to the Pallas implementation;
the XLA chunked-associative-scan path remains as fallback/oracle.
"""

from tamtr_tpu.kernels.selective_scan import selective_scan_pallas  # noqa: F401


def enable() -> None:
    from tamtr_tpu.nn import ssm

    ssm.set_scan_impl("pallas")
