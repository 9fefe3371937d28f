r"""Two-layer quasi-geostrophic (QG) flow — multi-field assimilation system.

The reference's qg branch adds a two-layer QG configuration
(BASELINE.json configs: "Two-layer quasi-geostrophic model (qg branch):
multi-field assimilation at scale"); this is its TPU-native counterpart,
built on the same real-pair matmul-DFT spectral engine as
:class:`~sda_tpu.dynamics.kolmogorov.KolmogorovFlow`.

Standard rigid-lid two-layer QG on the doubly-periodic :math:`[0, 2\pi]^2`
beta-plane with equal layer depths (the textbook/pyqg formulation):

.. math::
    \partial_t q_i + J(\psi_i, q_i) + U_i \partial_x q_i
        + Q_{iy} \partial_x \psi_i
        = -\delta_{i2}\, r \nabla^2 \psi_2 - \nu_4 \nabla^4 q_i

with layer potential vorticities :math:`q_i = \nabla^2 \psi_i +
\tfrac{k_d^2}{2} (\psi_{3-i} - \psi_i)`, imposed baroclinic shear
:math:`U_1 = -U_2 = U/2`, background PV gradients
:math:`Q_{iy} = \beta \pm \tfrac{k_d^2}{2} U`, bottom drag :math:`r` on the
lower layer, and spectral hyperviscosity integrated exactly via the
integrating factor. Advection and the linear-in-:math:`\psi` terms advance
with the same imaginary-axis-stable IF-RK3 stages as the Kolmogorov solver;
the quadratic terms are dealiased by spectral truncation (2/3 rule).

States are channel-first potential-vorticity fields ``(..., 2, H, W)``
(layer 1, layer 2) — a genuinely multi-field assimilation target.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.spectral import RealDFT2
from .markov import MarkovChain
from . import ops

Array = jax.Array
Spectral = Tuple[Array, Array]  # (re, im), stacked over layers in axis -3


class QuasiGeostrophic(MarkovChain):
    r"""Two-layer quasi-geostrophic dynamics.

    Arguments:
        size: The grid size per axis.
        dt: The transition time step.
        beta: The planetary vorticity gradient.
        shear: The imposed baroclinic shear ``U`` (``U_1 = -U_2 = U/2``).
        deformation_wavenumber: The baroclinic deformation wavenumber
            ``k_d`` (coupling strength between the layers).
        drag: The bottom-drag coefficient on layer 2.
        hyperviscosity: The :math:`\nu_4` coefficient of :math:`\nabla^4`
            small-scale dissipation (scaled relative to the cutoff).
        max_velocity / courant: CFL substep estimate, as in Kolmogorov.
        dft_method: ``'auto'``, ``'matmul'``, ``'pallas'`` or ``'fft'``.
    """

    def __init__(
        self,
        size: int = 128,
        dt: float = 0.1,
        beta: float = 10.0,
        shear: float = 1.0,
        deformation_wavenumber: float = 8.0,
        drag: float = 0.2,
        hyperviscosity: float = None,
        max_velocity: float = 5.0,
        courant: float = 0.5,
        dft_method: str = 'auto',
    ):
        super().__init__()

        self.size = size
        self.dt = dt
        self.beta = beta
        self.u1 = shear / 2
        self.u2 = -shear / 2
        self.kd2 = deformation_wavenumber**2
        self.drag = drag

        modes = int(size / 3.0) + 1
        self.dft = RealDFT2(
            size, size, method=dft_method, h_modes=modes, w_modes=modes
        )

        # Axis -2 ("a") = y, axis -1 ("b") = x (zonal).
        self.ky = self.dft.freqs_h[:, None]
        self.kx = self.dft.freqs_w[None, :]
        self.k2 = self.kx**2 + self.ky**2

        # Background PV gradients.
        self.q1y = beta + self.kd2 / 2 * shear
        self.q2y = beta - self.kd2 / 2 * shear

        # Per-mode 2x2 inversion q = A psi with
        # A = [[-k2 - F, F], [F, -k2 - F]], F = kd^2/2. Its inverse:
        # det = k2 (k2 + 2F); psi_1 = [(-k2-F) q1 - F q2] / det (and sym.)
        f_half = self.kd2 / 2
        det = self.k2 * (self.k2 + 2 * f_half)
        inv_det = jnp.where(det > 0, 1.0 / jnp.where(det > 0, det, 1.0), 0.0)
        self.inv_aa = (-self.k2 - f_half) * inv_det  # diagonal
        self.inv_ab = -f_half * inv_det  # off-diagonal

        # CFL substepping (advecting speed ~ max_velocity + |U|/2).
        dx = 2 * math.pi / size
        dt_min = courant * dx / (max_velocity + abs(shear) / 2)
        self.steps = 1 if dt_min > dt else math.ceil(dt / dt_min)
        h = dt / self.steps
        self.h = h

        # Hyperviscosity scaled so the cutoff mode damps strongly per step.
        if hyperviscosity is None:
            k_cut = float(modes - 1)
            hyperviscosity = 5.0 / (h * k_cut**4)
        self.nu4 = hyperviscosity

        lin = -self.nu4 * self.k2**2
        self.exp_full = jnp.exp(lin * h)
        self.exp_half = jnp.exp(lin * h / 2)

    # -- Inversion and conversions ------------------------------------------

    def _invert(self, q: Spectral) -> Spectral:
        r"""Potential vorticity -> streamfunction, per mode (2x2 solve).

        ``q``: pair of ``(..., 2, K, F)`` arrays (layers stacked in -3).
        """

        qr, qi = q

        q1r, q2r = qr[..., 0, :, :], qr[..., 1, :, :]
        q1i, q2i = qi[..., 0, :, :], qi[..., 1, :, :]

        p1r = self.inv_aa * q1r + self.inv_ab * q2r
        p2r = self.inv_ab * q1r + self.inv_aa * q2r
        p1i = self.inv_aa * q1i + self.inv_ab * q2i
        p2i = self.inv_ab * q1i + self.inv_aa * q2i

        return (
            jnp.stack((p1r, p2r), axis=-3),
            jnp.stack((p1i, p2i), axis=-3),
        )

    def to_spectral(self, x: Array) -> Spectral:
        r"""Physical PV ``(..., 2, H, W)`` -> spectral pair."""

        return self.dft.rfft2(x)

    def to_physical(self, q: Spectral) -> Array:
        return self.dft.irfft2(*q)

    def streamfunction(self, x: Array) -> Array:
        r"""Physical PV -> physical streamfunction (both layers)."""

        return self.to_physical(self._invert(self.to_spectral(x)))

    # -- Dynamics ------------------------------------------------------------

    def _tendency(self, q: Spectral) -> Spectral:
        r"""Explicit tendency: advection + background terms + bottom drag."""

        qr, qi = q
        pr, pi = self._invert(q)

        # Derivatives in pair form: d/dx = i kx, d/dy = i ky.
        def ddx(r, i):
            return (-self.kx * i, self.kx * r)

        def ddy(r, i):
            return (-self.ky * i, self.ky * r)

        px_r, px_i = ddx(pr, pi)
        py_r, py_i = ddy(pr, pi)
        qx_r, qx_i = ddx(qr, qi)
        qy_r, qy_i = ddy(qr, qi)

        # Physical-space products (dealiased by the truncated transform).
        u = -self.dft.irfft2(py_r, py_i)  # (.., 2, H, W)
        v = self.dft.irfft2(px_r, px_i)
        qx = self.dft.irfft2(qx_r, qx_i)
        qy = self.dft.irfft2(qy_r, qy_i)

        adv_r, adv_i = self.dft.rfft2(u * qx + v * qy)

        # Mean-flow advection U_i dq_i/dx and background gradients Q_iy v_i.
        u_mean = jnp.asarray([self.u1, self.u2]).reshape(
            (2,) + (1,) * 2
        )
        qgrad = jnp.asarray([self.q1y, self.q2y]).reshape((2,) + (1,) * 2)

        mean_r = -u_mean * qx_r - qgrad * px_r
        mean_i = -u_mean * qx_i - qgrad * px_i

        # Bottom drag -r nabla^2 psi_2 (layer 2 only).
        lap2_r = -self.k2 * pr[..., 1, :, :]
        lap2_i = -self.k2 * pi[..., 1, :, :]
        zeros = jnp.zeros_like(lap2_r)
        drag_r = jnp.stack((zeros, -self.drag * lap2_r), axis=-3)
        drag_i = jnp.stack((zeros, -self.drag * lap2_i), axis=-3)

        return (
            -adv_r + mean_r + drag_r,
            -adv_i + mean_i + drag_i,
        )

    def substep(self, q: Spectral) -> Spectral:
        r"""Integrating-factor classical RK3 (as in the Kolmogorov solver)."""

        h = self.h
        e1 = self.exp_half
        e2 = self.exp_full
        qr, qi = q

        k1r, k1i = self._tendency(q)

        q2 = (e1 * (qr + h / 2 * k1r), e1 * (qi + h / 2 * k1i))
        k2r, k2i = self._tendency(q2)

        q3 = (
            e2 * qr - h * e2 * k1r + 2 * h * e1 * k2r,
            e2 * qi - h * e2 * k1i + 2 * h * e1 * k2i,
        )
        k3r, k3i = self._tendency(q3)

        return (
            e2 * qr + h / 6 * (e2 * k1r + 4 * e1 * k2r + k3r),
            e2 * qi + h / 6 * (e2 * k1i + 4 * e1 * k2i + k3i),
        )

    def _advance(self, q: Spectral) -> Spectral:
        return jax.lax.fori_loop(0, self.steps, lambda _, q: self.substep(q), q)

    def transition(self, key: Array, x: Array) -> Array:
        r"""Deterministic QG transition on PV fields (key unused)."""

        return self.to_physical(self._advance(self.to_spectral(x)))

    def trajectory(
        self,
        key: Array,
        x: Array,
        length: int,
        last: bool = False,
    ) -> Array:
        r"""Scanned rollout staying in spectral space between outer steps."""

        q = self.to_spectral(x)

        if last:
            q = jax.lax.fori_loop(0, length, lambda _, q: self._advance(q), q)
            return self.to_physical(q)
        else:
            def step(q, _):
                q = self._advance(q)
                return q, self.to_physical(q)

            _, xs = jax.lax.scan(step, q, None, length=length)
            return xs

    # -- Initial conditions ---------------------------------------------------

    def prior(
        self,
        key: Array,
        shape: Sequence[int] = (),
        amplitude: float = 5.0,
        peak_wavenumber: float = 6.0,
    ) -> Array:
        r"""Band-limited random PV in both layers, rms-normalized."""

        shape = tuple(shape)
        noise = jax.random.normal(key, shape + (2, self.size, self.size))

        nr, ni = self.dft.rfft2(noise)

        k = jnp.sqrt(self.k2)
        g = (k / peak_wavenumber) ** 2 * jnp.exp(-((k / peak_wavenumber) ** 2))

        qr, qi = nr * g, ni * g
        q = self.dft.irfft2(qr, qi)

        rms = jnp.sqrt(jnp.mean(q**2, axis=(-2, -1), keepdims=True))

        return q * (amplitude / rms)

    # -- Observation operators -------------------------------------------------

    coarsen = staticmethod(ops.coarsen)
    upsample = staticmethod(ops.upsample)
    vorticity = staticmethod(ops.vorticity)
