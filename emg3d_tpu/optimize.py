"""Inversion building blocks: misfit and adjoint-state gradient.

Reference parity: /root/reference/emg3d/optimize.py.
"""
import numpy as np

from . import maps

__all__ = ['misfit', 'gradient']


def misfit(simulation):
    r"""Weighted least-squares data misfit φ = ½ Σ ||W (d_syn − d_obs)||².

    Stores ``residual`` and ``weights`` (1/std²) in the survey data;
    triggers ``compute()`` if fields are missing.
    Reference parity: emg3d/optimize.py:36-112.
    """
    std = simulation.survey.standard_deviation
    if std is None:
        raise ValueError(
            "Either `noise_floor` or `relative_error` or both must\n"
            "be provided (>0) to compute the `standard_deviation`.\n"
            "It can also be set directly (same shape as data).\n"
            "The standard deviation is required to compute the misfit.")

    test_efield = sum(
        1 if simulation._dict_efield[src][freq] is None else 0
        for src, freq in simulation._srcfreq)
    if test_efield:
        simulation.compute()

    residual = simulation.data.synthetic - simulation.data.observed
    simulation.data['residual'] = residual

    if 'weights' not in simulation.data.keys():
        simulation.data['weights'] = 1 / np.asarray(std)**2
    weights = simulation.data['weights']

    phi = np.nansum(weights * (residual.conj() * residual)).real / 2
    return phi


def gradient(simulation):
    r"""Adjoint-state gradient of the misfit ([PlMu08] Eq. 10).

    Limitations (as in the reference): isotropic conductivity models
    only, no ε_r or μ_r.

    Per (src, freq): g_edges = −Re(λ̄ · E · s μ0), mapped to cell
    centers (edges2cellaverages, × V/4), interpolated (cubic) back to
    the model grid, summed; finally the mapping's derivative chain is
    applied.  Reference parity: emg3d/optimize.py:115-217.
    """
    if simulation.model.case != 0:
        raise NotImplementedError(
            "Gradient only implemented for isotropic models.")

    var = (simulation.model.epsilon_r, simulation.model.mu_r)
    for v, n in zip(var, ('el. permittivity', 'magn. permeability')):
        if v is not None and not np.allclose(v, 1.0):
            raise NotImplementedError(f"Gradient not implemented for {n}.")

    # Ensure misfit (and thus forward fields) are computed.
    _ = simulation.misfit

    # Back-propagate the weighted residuals (receivers as sources).
    simulation._bcompute()

    grad_model = np.zeros(simulation.grid.shape_cells)

    for src, freq in simulation._srcfreq:
        bf = simulation._dict_bfield[src][freq]
        ef = simulation._dict_efield[src][freq]
        smu0 = ef.smu0

        gfx = -np.real(np.asarray(bf.fx) * np.asarray(ef.fx) * smu0)
        gfy = -np.real(np.asarray(bf.fy) * np.asarray(ef.fy) * smu0)
        gfz = -np.real(np.asarray(bf.fz) * np.asarray(ef.fz) * smu0)

        cgrid = simulation._dict_grid[src][freq]
        vol = np.asarray(cgrid.cell_volumes)
        gx, gy, gz = maps.edges2cellaverages(gfx, gfy, gfz, vol)
        grad = gx + gy + gz

        # Back to the model grid (cubic interpolation of -grad).
        tgrad = maps.grid2grid(cgrid, -grad, simulation.grid,
                               method='cubic')
        grad_model += tgrad

    simulation.model.map.derivative_chain(
        grad_model, simulation.model.property_x)

    return grad_model
