"""Pure-Python/numpy kernels — no Ray imports.

Shared between the single-threaded golden oracle (ocr_ray.golden) and the
distributed Ray stages (ocr_ray.stages.*) so that span-sequence equality
between the two is a property of the plumbing, not of duplicated logic.
"""
