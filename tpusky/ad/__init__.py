"""Differentiable-rendering toolkit (reference: ``src/python/python/ad/``).

- :mod:`tpusky.ad.integrators` — render_primal / render_forward /
  render_backward (ADIntegrator surface, PRB-equivalent memory profile).
- :mod:`tpusky.ad.optimizers` — SGD / Adam (incl. masked + uniform
  variants).
- :mod:`tpusky.ad.largesteps` — LargeSteps preconditioned mesh
  optimization.
- :mod:`tpusky.ad.projective` — boundary-term (visibility-discontinuity)
  gradients: primary silhouettes + delta-directional shadow curves (the
  projective integrators' boundary contribution).
"""

from .integrators import (AD_INTEGRATOR_ALIASES, render_backward,
                          render_forward, render_primal)
from .largesteps import LargeSteps, mesh_laplacian_edges
from .optimizers import SGD, Adam, Optimizer
from .projective import (boundary_grad, primary_boundary_grad,
                         shadow_boundary_grad)

__all__ = [
    "render_primal", "render_forward", "render_backward",
    "AD_INTEGRATOR_ALIASES", "SGD", "Adam", "Optimizer",
    "LargeSteps", "mesh_laplacian_edges",
    "boundary_grad", "primary_boundary_grad", "shadow_boundary_grad",
]
