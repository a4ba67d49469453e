"""Minimal reimplementation of the diffusers surface used by the
reference's ``viscy_models/celldiff/modules/transformer.py``:

- ``diffusers.models.attention.FeedForward`` (GEGLU variant)
- ``diffusers.models.attention_processor.Attention`` (self-attention,
  default processor, no cross-attention)

Semantics follow diffusers (Apache-2.0): bias-configurable Q/K/V
projections to ``heads*dim_head``, scaled-dot-product softmax attention,
``to_out = [Linear, Dropout]``; FeedForward ``net`` is
``[GEGLU, Dropout, Linear(, Dropout if final_dropout)]`` with exact-erf
GELU gating. Test fixture only.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class GEGLU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int, bias: bool = True) -> None:
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        hidden, gate = self.proj(x).chunk(2, dim=-1)
        return hidden * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(
        self,
        dim: int,
        dim_out: int | None = None,
        mult: int = 4,
        dropout: float = 0.0,
        activation_fn: str = "geglu",
        final_dropout: bool | float = False,
        inner_dim: int | None = None,
        bias: bool = True,
    ) -> None:
        super().__init__()
        if activation_fn != "geglu":
            raise NotImplementedError(f"shim supports geglu only, got {activation_fn}")
        inner_dim = inner_dim if inner_dim is not None else int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim
        self.net = nn.ModuleList(
            [GEGLU(dim, inner_dim, bias=bias), nn.Dropout(dropout), nn.Linear(inner_dim, dim_out, bias=bias)]
        )
        # diffusers appends a trailing dropout when final_dropout is truthy
        if final_dropout:
            self.net.append(nn.Dropout(dropout))

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        for mod in self.net:
            x = mod(x)
        return x


class Attention(nn.Module):
    def __init__(
        self,
        query_dim: int,
        heads: int = 8,
        dim_head: int = 64,
        dropout: float = 0.0,
        bias: bool = False,
        cross_attention_dim: int | None = None,
        upcast_attention: bool = False,
        out_bias: bool = True,
    ) -> None:
        super().__init__()
        if cross_attention_dim is not None:
            raise NotImplementedError("shim supports self-attention only")
        self.heads = heads
        self.dim_head = dim_head
        inner_dim = heads * dim_head
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner_dim, query_dim, bias=out_bias), nn.Dropout(dropout)])

    def forward(self, hidden_states: torch.Tensor, **kwargs) -> torch.Tensor:
        b, t, _ = hidden_states.shape
        shape = (b, t, self.heads, self.dim_head)
        q = self.to_q(hidden_states).view(shape).transpose(1, 2)
        k = self.to_k(hidden_states).view(shape).transpose(1, 2)
        v = self.to_v(hidden_states).view(shape).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, t, self.heads * self.dim_head)
        out = self.to_out[0](out)
        return self.to_out[1](out)


def _build_namespace():
    import types

    root = types.ModuleType("diffusers")
    models = types.ModuleType("diffusers.models")
    attention = types.ModuleType("diffusers.models.attention")
    processor = types.ModuleType("diffusers.models.attention_processor")

    attention.FeedForward = FeedForward
    attention.GEGLU = GEGLU
    processor.Attention = Attention
    models.attention = attention
    models.attention_processor = processor
    root.models = models
    root.__version__ = "0.31.0+viscy-golden-shim"
    return {
        "diffusers": root,
        "diffusers.models": models,
        "diffusers.models.attention": attention,
        "diffusers.models.attention_processor": processor,
    }
