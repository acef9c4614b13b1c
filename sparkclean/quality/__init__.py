from . import matrix_ops  # noqa: F401
from .issues import (  # noqa: F401
    bottom_n_flags,
    find_label_issues,
    find_label_issues_batched,
    num_label_issues,
)
from .joint import compute_confident_joint, estimate_joint, label_counts  # noqa: F401
from .ood import with_ood_scores  # noqa: F401
from .scores import with_label_quality_scores  # noqa: F401
from .thresholds import get_confident_thresholds  # noqa: F401
