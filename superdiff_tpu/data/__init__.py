from superdiff_tpu.data.synthetic import synthetic_xray_batch

__all__ = ["synthetic_xray_batch"]
