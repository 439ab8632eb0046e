"""Operator surface: thin, typed builders over DataFrame transformations.

Every operator is a pure DataFrame→DataFrame function: no ``collect()`` on
the data path, no driver-side row loops — scale is delegated to Catalyst,
AQE and the shuffle machinery (SURVEY.md §2.2 design rule).
"""
