"""Minimal reimplementation of the pytorch_metric_learning surface used by
the reference's ``viscy_models/contrastive/loss.py``:

- ``pytorch_metric_learning.losses.NTXentLoss`` (the base class whose
  ``_compute_loss`` the reference subclasses and whose pair-index plumbing
  it relies on)
- ``pytorch_metric_learning.utils.common_functions``: ``to_dtype``,
  ``neg_inf``, ``small_val``

Semantics follow pytorch-metric-learning (MIT): CosineSimilarity distance,
all-pairs index generation from integer labels, GenericPairLoss pair
matrix extraction, MeanReducer over pos_pair losses.  Test fixture only.
"""

from __future__ import annotations

import torch
from torch import nn


def to_dtype(x: torch.Tensor, tensor: torch.Tensor | None = None, dtype=None):
    dt = dtype if dtype is not None else tensor.dtype
    if x.dtype != dt:
        x = x.type(dt)
    return x


def small_val(dtype) -> float:
    return torch.finfo(dtype).tiny


def neg_inf(dtype) -> float:
    return torch.finfo(dtype).min


def get_all_pairs_indices(labels: torch.Tensor, ref_labels: torch.Tensor | None = None):
    """All positive (same label, i!=j) and negative (diff label) index pairs."""
    if ref_labels is None:
        ref_labels = labels
    labels1 = labels.unsqueeze(1)
    labels2 = ref_labels.unsqueeze(0)
    matches = (labels1 == labels2).byte()
    diffs = matches ^ 1
    if ref_labels is labels:
        matches.fill_diagonal_(0)
    a1_idx, p_idx = torch.where(matches)
    a2_idx, n_idx = torch.where(diffs)
    return a1_idx, p_idx, a2_idx, n_idx


class CosineSimilarity:
    """pytorch_metric_learning.distances.CosineSimilarity."""

    is_inverted = True

    def __call__(self, query_emb: torch.Tensor, ref_emb: torch.Tensor | None = None) -> torch.Tensor:
        if ref_emb is None:
            ref_emb = query_emb
        query = torch.nn.functional.normalize(query_emb, p=2, dim=1)
        ref = torch.nn.functional.normalize(ref_emb, p=2, dim=1)
        return torch.matmul(query, ref.t())


class NTXentLoss(nn.Module):
    """pytorch_metric_learning.losses.NTXentLoss with MeanReducer.

    ``forward(embeddings, labels)`` — embeddings (N, D), integer labels (N,);
    positives are same-label pairs, negatives different-label pairs.
    """

    def __init__(self, temperature: float = 0.07, **kwargs):
        super().__init__()
        self.temperature = temperature
        self.distance = CosineSimilarity()

    def add_to_recordable_attributes(self, *a, **k):
        pass

    def zero_losses(self):
        return {"loss": {"losses": 0, "indices": None, "reduction_type": "already_reduced"}}

    def _compute_loss(self, pos_pairs, neg_pairs, indices_tuple):
        a1, p, a2, _ = indices_tuple
        if len(a1) > 0 and len(a2) > 0:
            dtype = neg_pairs.dtype
            if not self.distance.is_inverted:
                pos_pairs = -pos_pairs
                neg_pairs = -neg_pairs
            pos_pairs = pos_pairs.unsqueeze(1) / self.temperature
            neg_pairs = neg_pairs / self.temperature
            n_per_p = to_dtype(a2.unsqueeze(0) == a1.unsqueeze(1), dtype=dtype)
            neg_pairs = neg_pairs * n_per_p
            neg_pairs[n_per_p == 0] = neg_inf(dtype)
            max_val = torch.max(pos_pairs, torch.max(neg_pairs, dim=1, keepdim=True)[0]).detach()
            numerator = torch.exp(pos_pairs - max_val).squeeze(1)
            denominator = torch.sum(torch.exp(neg_pairs - max_val), dim=1) + numerator
            log_exp = torch.log((numerator / denominator) + small_val(dtype))
            return {
                "loss": {
                    "losses": -log_exp,
                    "indices": (a1, p),
                    "reduction_type": "pos_pair",
                }
            }
        return self.zero_losses()

    def forward(self, embeddings: torch.Tensor, labels: torch.Tensor) -> torch.Tensor:
        indices_tuple = get_all_pairs_indices(labels)
        a1, p, a2, n = indices_tuple
        mat = self.distance(embeddings)
        pos_pairs = mat[a1, p]
        neg_pairs = mat[a2, n]
        loss_dict = self._compute_loss(pos_pairs, neg_pairs, indices_tuple)
        losses = loss_dict["loss"]["losses"]
        if loss_dict["loss"]["reduction_type"] == "already_reduced":
            return torch.as_tensor(losses, dtype=embeddings.dtype, device=embeddings.device)
        return losses.mean()


def _build_namespace():
    import types

    pml_mod = types.ModuleType("pytorch_metric_learning")
    losses_mod = types.ModuleType("pytorch_metric_learning.losses")
    utils_mod = types.ModuleType("pytorch_metric_learning.utils")
    cf_mod = types.ModuleType("pytorch_metric_learning.utils.common_functions")
    distances_mod = types.ModuleType("pytorch_metric_learning.distances")

    losses_mod.NTXentLoss = NTXentLoss
    cf_mod.to_dtype = to_dtype
    cf_mod.small_val = small_val
    cf_mod.neg_inf = neg_inf
    utils_mod.common_functions = cf_mod
    distances_mod.CosineSimilarity = CosineSimilarity
    pml_mod.losses = losses_mod
    pml_mod.utils = utils_mod
    pml_mod.distances = distances_mod
    pml_mod.__version__ = "2.0.0+viscy-golden-shim"
    return {
        "pytorch_metric_learning": pml_mod,
        "pytorch_metric_learning.losses": losses_mod,
        "pytorch_metric_learning.utils": utils_mod,
        "pytorch_metric_learning.utils.common_functions": cf_mod,
        "pytorch_metric_learning.distances": distances_mod,
    }
