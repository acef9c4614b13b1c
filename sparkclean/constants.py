"""Numeric constants shared across the engine.

Values mirror the reference semantics (cleanlab/internal/constants.py:1-6)
so that score/threshold comparisons reproduce the reference bit-for-bit
(within the stated float tolerance).
"""

# Fuzzy float comparison margin used in confident-bin tests and the
# argmax boost of the reduce-issues pass.
FLOATING_POINT_COMPARISON = 1e-6

# Lower clip applied to self-confidence and intermediate quality scores.
CLIPPING_LOWER_BOUND = 1e-6

# Lower clip applied to per-class confident thresholds.
CONFIDENT_THRESHOLDS_LOWER_BOUND = 2 * FLOATING_POINT_COMPARISON

# Tiny denominator guard for driver-side matrix normalisation.
TINY_VALUE = 1e-100

# The reference version whose numeric semantics this engine reproduces;
# recorded in saved Datalab bundles (save_datalab) the way the reference
# records cleanlab.__version__ in its pickles.
REFERENCE_VERSION = "2.9.0"

# Threshold assigned to classes absent from the label column; chosen so no
# valid probability (<=1) can ever reach it.
MISSING_CLASS_THRESHOLD = 2.0
