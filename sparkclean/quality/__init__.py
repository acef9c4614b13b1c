from . import matrix_ops  # noqa: F401
from .issues import (  # noqa: F401
    bottom_n_flags,
    find_label_issues,
    find_label_issues_batched,
    num_label_issues,
)
from .joint import compute_confident_joint, estimate_joint, label_counts  # noqa: F401
from .datalab import (  # noqa: F401
    find_issues,
    knn_graph_clusters,
    knn_vote_pred_probs,
    label_issues_from_features,
    underperforming_group_from_graph,
)
from .ood import with_ood_scores  # noqa: F401
from .scores import with_label_quality_scores  # noqa: F401
from .thresholds import get_confident_thresholds  # noqa: F401
from .valuation import knn_shapley_scores, non_iid_ks  # noqa: F401
