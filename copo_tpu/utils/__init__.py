from copo_tpu.utils.pretty import SafeFallbackEncoder, pretty_print

__all__ = ["SafeFallbackEncoder", "pretty_print"]
