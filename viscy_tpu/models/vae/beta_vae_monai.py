"""Reference-path shim: ``viscy_models.vae.beta_vae_monai.BetaVaeMonai``
resolves here (the MONAI backend is replaced by flax convs in
:mod:`viscy_tpu.models.vae.beta_vae_conv`)."""

from viscy_tpu.models.vae.beta_vae_conv import BetaVaeConv, BetaVaeMonai

__all__ = ["BetaVaeConv", "BetaVaeMonai"]
