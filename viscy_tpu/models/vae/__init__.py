"""VAE models (reference ``viscy_models/vae``)."""

from viscy_tpu.models.vae.beta_vae_25d import BetaVae25D, VaeOutput

__all__ = ["BetaVae25D", "VaeOutput"]
