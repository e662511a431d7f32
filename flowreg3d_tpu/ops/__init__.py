"""Numeric primitives (TPU-first): resize, warp, filters, gradients, xcorr."""
