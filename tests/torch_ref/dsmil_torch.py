"""Torch twin of the OFFICIAL DSMIL module layout (Li et al., CVPR 2021).

Written from the published paper math + the official repo's documented
architecture (github.com/binli123/dsmil-wsi ``dsmil.py``: ``IClassifier`` /
``BClassifier`` / ``MILNet``), in the configuration the official WSI
evaluation uses — ``nonlinear=True`` (2-layer tanh query MLP) and
``passing_v=True`` (dropout + linear + ReLU value stream), with the bag head
as ``Conv1d(C, C, kernel_size=V)`` over the ``(1, C, V)`` per-class bag
embeddings. NOT copied; independently re-implemented as a parity oracle so
the flax ``models/dsmil.py`` head is checked against the official module
structure (per ADVICE r3), not against a re-derivation of the same math.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class IClassifier(nn.Module):
    """Per-instance linear classifier (features are precomputed embeddings,
    so the official ``feature_extractor`` is the identity here — the WSI
    pipeline feeds bags of backbone features, exactly like the flax head)."""

    def __init__(self, feature_size: int, output_class: int):
        super().__init__()
        self.fc = nn.Linear(feature_size, output_class)

    def forward(self, feats: torch.Tensor):  # (N, D)
        c = self.fc(feats)
        return feats, c  # (N, D), (N, C)


class BClassifier(nn.Module):
    """Bag classifier: critical-instance attention over queries, per-class
    value pooling, Conv1d bag head. ``nonlinear=True, passing_v=True``."""

    def __init__(self, input_size: int, output_class: int, q_dim: int = 128,
                 dropout_v: float = 0.0):
        super().__init__()
        self.q = nn.Sequential(
            nn.Linear(input_size, q_dim), nn.ReLU(),
            nn.Linear(q_dim, q_dim), nn.Tanh(),
        )
        self.v = nn.Sequential(
            nn.Dropout(dropout_v),
            nn.Linear(input_size, input_size),
            nn.ReLU(),
        )
        self.fcc = nn.Conv1d(output_class, output_class, kernel_size=input_size)

    def forward(self, feats: torch.Tensor, c: torch.Tensor):  # (N, D), (N, C)
        V = self.v(feats)  # (N, V)
        Q = self.q(feats).view(feats.shape[0], -1)  # (N, Q)
        # critical instance per class: top-1 instance logit
        _, m_indices = torch.sort(c, 0, descending=True)
        m_feats = torch.index_select(feats, dim=0, index=m_indices[0, :])  # (C, D)
        q_max = self.q(m_feats)  # (C, Q)
        A = torch.mm(Q, q_max.transpose(0, 1))  # (N, C)
        A = F.softmax(A / math.sqrt(Q.shape[1]), 0)
        B = torch.mm(A.transpose(0, 1), V)  # (C, V)
        B = B.view(1, B.shape[0], B.shape[1])  # (1, C, V)
        C = self.fcc(B)  # (1, C, 1)
        C = C.view(1, -1)
        return C, A, B


class MILNet(nn.Module):
    def __init__(self, i_classifier: IClassifier, b_classifier: BClassifier):
        super().__init__()
        self.i_classifier = i_classifier
        self.b_classifier = b_classifier

    def forward(self, x: torch.Tensor):  # (N, D)
        feats, classes = self.i_classifier(x)
        prediction_bag, A, B = self.b_classifier(feats, classes)
        return classes, prediction_bag, A, B


def build_official_dsmil(feature_size: int, output_class: int, q_dim: int = 128) -> MILNet:
    return MILNet(IClassifier(feature_size, output_class),
                  BClassifier(feature_size, output_class, q_dim=q_dim))


def load_flax_dsmil_params(net: MILNet, params: dict) -> None:
    """Load a flax ``models/dsmil.DSMIL`` param tree into the official-layout
    torch module (flax Dense kernels are (in, out); torch Linear weights are
    (out, in); the flax flattened-(C*V) fcc Dense maps onto Conv1d weight
    (C_out, C_in, V) via ``kernel[c_in*V + v, c_out] = w[c_out, c_in, v]``)."""
    import numpy as np

    def t(a):
        return torch.as_tensor(np.array(a))  # copy: keeps the tensor writable

    sd = {
        "i_classifier.fc.weight": t(params["i_classifier"]["kernel"]).t(),
        "i_classifier.fc.bias": t(params["i_classifier"]["bias"]),
        "b_classifier.q.0.weight": t(params["q0"]["kernel"]).t(),
        "b_classifier.q.0.bias": t(params["q0"]["bias"]),
        "b_classifier.q.2.weight": t(params["q1"]["kernel"]).t(),
        "b_classifier.q.2.bias": t(params["q1"]["bias"]),
        "b_classifier.v.1.weight": t(params["v"]["kernel"]).t(),
        "b_classifier.v.1.bias": t(params["v"]["bias"]),
        "b_classifier.fcc.bias": t(params["fcc"]["bias"]),
    }
    kern = t(params["fcc"]["kernel"])  # (C*V, C)
    c_out = kern.shape[1]
    v_dim = kern.shape[0] // c_out
    sd["b_classifier.fcc.weight"] = (
        kern.t().reshape(c_out, c_out, v_dim)  # (C_out, C_in, V)
    )
    net.load_state_dict(sd)
