"""Utilities: iteration logger, plotting helpers (reference utils/ +
bindings/python/aligator/utils)."""

from aligator_tpu.utils.logger import print_headline, print_row

__all__ = ["print_headline", "print_row"]
