"""Shared param-tree conventions for the model classes.

A model's `params` is either the plain UNet variable tree, or — when
auxiliary trainables join the train state — a dict holding the UNet
variables under 'unet' plus extra leaves:

  * 'refiner' — stage-1 trainable text-feature refiner (the reference
    trains it alongside the UNet and Polyak-averages both,
    ccdm/ddpm/trainer.py:287, 850-852);
  * 'logvar'  — stage-2 learned per-timestep log-variance (T,)
    (ldm/models/diffusion/ddpm.py:111-115, 423: nn.Parameter joined to
    the optimizer when learn_logvar).

Keeping extras as siblings of the UNet tree means EMA, checkpointing and
grad-sync cover them with zero special cases.
"""

from __future__ import annotations

__all__ = ["unet_vars"]


def unet_vars(params):
    """The UNet variable tree inside a possibly-augmented params tree."""
    return params["unet"] if isinstance(params, dict) and "unet" in params else params
