"""VAE models (reference ``viscy_models/vae``)."""

from viscy_tpu.models.vae.beta_vae_25d import BetaVae25D, VaeOutput
from viscy_tpu.models.vae.beta_vae_conv import BetaVaeConv, BetaVaeMonai

__all__ = ["BetaVae25D", "BetaVaeConv", "BetaVaeMonai", "VaeOutput"]
