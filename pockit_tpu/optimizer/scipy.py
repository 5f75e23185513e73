"""scipy ``trust-constr`` adapter (reference: ``/root/reference/pockit/
optimizer/scipy.py:32-100``).

Kept as an independent cross-check of the transcription: it consumes the
same jitted NLP callbacks as the native interior-point solver but optimizes
with scipy's solver, so agreement between the two validates both.
Jacobian/Hessian are passed dense — the problems this adapter is used for
are small, and the dense form is what the TPU path produces anyway.
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

import numpy as np
from scipy.optimize import Bounds as ScipyBounds
from scipy.optimize import NonlinearConstraint, minimize

from pockit_tpu.base.system import SystemBase
from pockit_tpu.optimizer._common import postprocess, preprocess


def solve(
    system: SystemBase,
    guess,
    optimizer_options: Optional[dict] = None,
):
    """Solve the system using scipy's trust-constr method.

    Same calling convention as :func:`pockit_tpu.optimizer.ipm.solve`;
    ``optimizer_options`` are passed verbatim to ``scipy.optimize.minimize``.
    """
    x_0, guess_is_variable = preprocess(system, guess)
    if optimizer_options is None:
        optimizer_options = {}

    compiled = system.compiled
    num_cons = len(compiled.c_lb)

    constraints = []
    if num_cons:
        constraints.append(
            NonlinearConstraint(
                lambda x: np.asarray(compiled.constraints(x)),
                compiled.c_lb,
                compiled.c_ub,
                jac=lambda x: np.asarray(compiled.jacobian(x)),
                hess=lambda x, v: np.asarray(compiled.hessian(x, v, 0.0)),
            )
        )

    res = minimize(
        lambda x: float(compiled.objective(x)),
        x_0,
        method="trust-constr",
        jac=lambda x: np.asarray(compiled.gradient(x)),
        hess=lambda x: np.asarray(
            compiled.hessian(x, np.zeros(num_cons), 1.0)
        ),
        constraints=constraints,
        bounds=ScipyBounds(compiled.z_lb, compiled.z_ub),
        options=optimizer_options,
    )

    if guess_is_variable:
        Variable = type(guess)
    else:
        Variable = type(guess[0])
    result = postprocess(Variable, system, res.x, guess_is_variable)
    return result, res
