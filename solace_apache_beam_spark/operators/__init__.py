"""Operator library: composable ``DataFrame -> DataFrame`` transforms
mirroring the reference's PTransforms (SURVEY.md §2.7 — Beam ``PTransform``
composition maps to plain Python functions used with ``DataFrame.transform``).
"""
