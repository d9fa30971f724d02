from .clustering import (
    corr_edges,
    correlation_matrix,
    dbscan,
    kmeans_clusters,
    louvain_communities_df,
    pca_project,
)
from .metrics import accuracy, confusion_matrix, per_class_f1

__all__ = [
    "accuracy",
    "confusion_matrix",
    "corr_edges",
    "correlation_matrix",
    "dbscan",
    "kmeans_clusters",
    "louvain_communities_df",
    "pca_project",
    "per_class_f1",
]
