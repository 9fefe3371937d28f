r"""2-D Kolmogorov flow: a pure-JAX pseudo-spectral Navier-Stokes solver.

TPU-native replacement for the reference's jax-cfd delegation
(``sda/mcs.py:244-338``). The reference wraps jax-cfd's finite-volume
semi-implicit solver behind a torch bridge that crosses the torch<->JAX
boundary twice per step; here the solver is first-class:

- vorticity formulation on the periodic square :math:`[0, 2\pi]^2`, advanced
  entirely in Fourier space with 2/3-rule dealiasing;
- spectra are carried as **(re, im) pairs of real arrays** and transforms run
  through :class:`~sda_tpu.ops.spectral.RealDFT2` — on TPU that is DFT-as-
  matmul on the MXU with no complex dtype anywhere (some TPU runtimes do not
  implement complex/FFT ops; on the MXU the basis matmul is also simply fast
  at these grid sizes);
- viscosity and linear drag integrated **exactly** via an integrating factor;
  advection + constant Kolmogorov forcing with a classical RK3 on the
  transformed variable (imaginary-axis stable at the advective CFL, and
  higher-order than jax-cfd's explicit-Euler advection);
- CFL-based substepping mirroring the reference's ``stable_time_step`` logic
  (``sda/mcs.py:274-284``: max velocity 5, Courant 0.5);
- rollouts stay in spectral space across steps (:meth:`trajectory`), so a
  full trajectory is a single ``lax.scan`` program with no host round-trips.

Physical setup matches reference ``sda/mcs.py:259-305``: forcing
:math:`\sin(4 b)` on the first velocity component (varying along the last
array axis), linear drag :math:`-0.1 u`, Reynolds number 1000, and a
filtered random divergence-free initial velocity field (max speed 3, peak
wavenumber 4). States are channel-first velocity fields ``(..., 2, H, W)``.
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
Spectral = Tuple[Array, Array]  # (re, im)


class KolmogorovFlow(MarkovChain):
    r"""Incompressible 2-D Navier-Stokes with Kolmogorov forcing.

    Arguments:
        size: The grid size per axis.
        dt: The transition time step.
        reynolds: The Reynolds number (viscosity is ``1/reynolds``).
        forcing_wavenumber: The forcing wavenumber (``sin(k b)`` on u).
        forcing_magnitude: The forcing amplitude.
        drag: The linear drag coefficient.
        max_velocity: The velocity bound used for the CFL substep estimate.
        courant: The Courant number used for the CFL substep estimate.
        dft_method: ``'auto'``, ``'matmul'`` (MXU) or ``'fft'`` (XLA call).
    """

    def __init__(
        self,
        size: int = 256,
        dt: float = 0.01,
        reynolds: float = 1e3,
        forcing_wavenumber: int = 4,
        forcing_magnitude: float = 1.0,
        drag: float = 0.1,
        max_velocity: float = 5.0,
        courant: float = 0.5,
        dft_method: str = 'auto',
    ):
        super().__init__()

        self.size = size
        self.dt = dt
        self.nu = 1.0 / reynolds
        self.drag = drag

        # Truncated spectral representation: carry only the modes the 2/3
        # rule retains (|k| <= size/3). Dealiasing of the quadratic advection
        # term is then exact by construction, and every DFT basis matmul
        # shrinks to ~45% of the full-spectrum FLOPs.
        modes = int(size / 3.0) + 1
        self.dft = RealDFT2(
            size, size, method=dft_method, h_modes=modes, w_modes=modes
        )

        self.ka = self.dft.freqs_h[:, None]
        self.kb = self.dft.freqs_w[None, :]
        self.k2 = self.ka**2 + self.kb**2
        self.inv_k2 = jnp.where(
            self.k2 > 0, 1.0 / jnp.where(self.k2 > 0, self.k2, 1.0), 0.0
        )

        # Curl of the forcing sin(k b) x_a-hat: -k cos(k b) (constant field).
        b = 2 * math.pi / size * (jnp.arange(size) + 0.5)
        curl_f = -forcing_magnitude * forcing_wavenumber * jnp.cos(
            forcing_wavenumber * b
        )
        curl_f = jnp.broadcast_to(curl_f, (size, size))
        self.forcing_re, self.forcing_im = self.dft.rfft2(curl_f)

        # CFL substepping, mirroring the reference's stable_time_step logic
        # (sda/mcs.py:274-284). The diffusion bound is kept for parity even
        # though the integrating factor treats diffusion exactly.
        dx = 2 * math.pi / size
        dt_advect = courant * dx / max_velocity
        dt_diffuse = dx**2 / (2 * 2 * self.nu)
        dt_min = min(dt_advect, dt_diffuse)

        self.steps = 1 if dt_min > dt else math.ceil(dt / dt_min)
        h = dt / self.steps

        # Exact integrating factors for the linear term -nu k^2 - drag.
        lin = -self.nu * self.k2 - drag
        self.h = h
        self.exp_full = jnp.exp(lin * h)
        self.exp_half = jnp.exp(lin * h / 2)
        self.mean_decay = math.exp(-drag * h)

        # Stability note: the explicit stage scheme must contain the
        # imaginary axis out to the advective CFL number k_max u h (~1 at the
        # reference's Courant setting), since advection eigenvalues are purely
        # imaginary and viscosity at the 2/3 cutoff only damps ~2%/substep.
        # Midpoint RK2 (|R(iy)| = sqrt(1 + y^4/4) > 1) blows up over long
        # horizons at 256^2; classical RK3 is stable for |y| <= sqrt(3).

    # -- Spectral <-> physical conversions ---------------------------------

    def to_spectral(self, x: Array) -> Tuple[Spectral, Array]:
        r"""Velocity ``(..., 2, H, W)`` -> (vorticity spectrum pair, mean)."""

        u = x[..., 0, :, :]
        v = x[..., 1, :, :]

        ur, ui = self.dft.rfft2(u)
        vr, vi = self.dft.rfft2(v)

        # w = i ka v_hat - i kb u_hat, in pair form.
        wr = -self.ka * vi + self.kb * ui
        wi = self.ka * vr - self.kb * ur

        mean = jnp.stack(
            (u.mean(axis=(-2, -1)), v.mean(axis=(-2, -1))), axis=-1
        )

        return (wr, wi), mean

    def _velocity_spectra(self, w: Spectral) -> Tuple[Spectral, Spectral]:
        r"""Stream-function inversion: u_hat = i kb psi, v_hat = -i ka psi."""

        wr, wi = w
        pr = wr * self.inv_k2
        pi = wi * self.inv_k2

        u_hat = (-self.kb * pi, self.kb * pr)
        v_hat = (self.ka * pi, -self.ka * pr)

        return u_hat, v_hat

    def to_velocity(self, w: Spectral, mean: Array) -> Array:
        r"""(vorticity spectrum pair, mean flow) -> velocity ``(..., 2, H, W)``."""

        u_hat, v_hat = self._velocity_spectra(w)

        u = self.dft.irfft2(*u_hat)
        v = self.dft.irfft2(*v_hat)

        uv = jnp.stack((u, v), axis=-3)

        return uv + mean[..., None, None]

    def vorticity_field(self, w: Spectral) -> Array:
        r"""Physical-space vorticity from its spectrum pair."""

        return self.dft.irfft2(*w)

    # -- Dynamics ----------------------------------------------------------

    def _nonlinear(self, w: Spectral) -> Spectral:
        r"""Dealiased advection + forcing: :math:`-(u \cdot \nabla)\omega + F`."""

        wr, wi = w
        u_hat, v_hat = self._velocity_spectra(w)

        u = self.dft.irfft2(*u_hat)
        v = self.dft.irfft2(*v_hat)

        # d/da = i ka, d/db = i kb, in pair form: (re, im) -> (-k im, k re).
        wa = self.dft.irfft2(-self.ka * wi, self.ka * wr)
        wb = self.dft.irfft2(-self.kb * wi, self.kb * wr)

        # The truncated forward transform IS the 2/3-rule dealiasing.
        ar, ai = self.dft.rfft2(u * wa + v * wb)

        return (-ar + self.forcing_re, -ai + self.forcing_im)

    def substep(self, w: Spectral) -> Spectral:
        r"""One CFL substep: integrating-factor classical RK3 (Kutta).

        In the transformed variable :math:`v = e^{-Lt} \omega` the stages are
        the classical third-order scheme; mapped back to :math:`\omega`:

        .. math::
            k_1 &= N(w) \\
            k_2 &= N(E_{1/2} (w + \tfrac{h}{2} k_1)) \\
            k_3 &= N(E_1 w - h E_1 k_1 + 2 h E_{1/2} k_2) \\
            w'  &= E_1 w + \tfrac{h}{6} (E_1 k_1 + 4 E_{1/2} k_2 + k_3)

        with :math:`E_s = e^{L s h}` applied exactly.
        """

        h = self.h
        e1 = self.exp_half
        e2 = self.exp_full
        wr, wi = w

        k1r, k1i = self._nonlinear(w)

        w2 = (e1 * (wr + h / 2 * k1r), e1 * (wi + h / 2 * k1i))
        k2r, k2i = self._nonlinear(w2)

        w3 = (
            e2 * wr - h * e2 * k1r + 2 * h * e1 * k2r,
            e2 * wi - h * e2 * k1i + 2 * h * e1 * k2i,
        )
        k3r, k3i = self._nonlinear(w3)

        return (
            e2 * wr + h / 6 * (e2 * k1r + 4 * e1 * k2r + k3r),
            e2 * wi + h / 6 * (e2 * k1i + 4 * e1 * k2i + k3i),
        )

    def _advance(self, w: Spectral, mean: Array) -> Tuple[Spectral, Array]:
        r"""Advances one transition (``self.steps`` substeps)."""

        w = jax.lax.fori_loop(0, self.steps, lambda _, w: self.substep(w), w)
        mean = mean * self.mean_decay**self.steps

        return w, mean

    def transition(self, key: Array, x: Array) -> Array:
        r"""Deterministic NS transition on velocity fields (key unused)."""

        w, mean = self.to_spectral(x)
        w, mean = self._advance(w, mean)

        return self.to_velocity(w, mean)

    def trajectory(
        self,
        key: Array,
        x: Array,
        length: int,
        last: bool = False,
    ) -> Array:
        r"""Scanned rollout that stays in spectral space between outer steps.

        Replaces the reference's per-step torch<->JAX round trip
        (``sda/mcs.py:333-338``) with a single compiled program.
        """

        w, mean = self.to_spectral(x)

        if last:
            def body(_, carry):
                return self._advance(*carry)

            w, mean = jax.lax.fori_loop(0, length, body, (w, mean))
            return self.to_velocity(w, mean)
        else:
            def step(carry, _):
                w, mean = self._advance(*carry)
                return (w, mean), self.to_velocity(w, mean)

            _, xs = jax.lax.scan(step, (w, mean), None, length=length)
            return xs

    # -- Initial conditions ------------------------------------------------

    def prior(
        self,
        key: Array,
        shape: Sequence[int] = (),
        max_velocity: float = 3.0,
        peak_wavenumber: float = 4.0,
    ) -> Array:
        r"""Filtered random divergence-free velocity field.

        TPU-native equivalent of jax-cfd's ``filtered_velocity_field``
        (invoked at reference ``sda/mcs.py:297-305``): white-noise velocity
        shaped by a band-pass filter peaked near ``peak_wavenumber``,
        projected onto divergence-free fields, and rescaled so the maximum
        speed equals ``max_velocity``.
        """

        shape = tuple(shape)
        noise = jax.random.normal(key, shape + (2, self.size, self.size))

        ur, ui = self.dft.rfft2(noise[..., 0, :, :])
        vr, vi = self.dft.rfft2(noise[..., 1, :, :])

        # Band-pass amplitude filter peaked near the target wavenumber.
        k = jnp.sqrt(self.k2)
        g = (k / peak_wavenumber) ** 2 * jnp.exp(-((k / peak_wavenumber) ** 2))

        ur, ui = ur * g, ui * g
        vr, vi = vr * g, vi * g

        # Leray projection onto divergence-free fields (real coefficients
        # apply identically to both members of each pair).
        dr = (self.ka * ur + self.kb * vr) * self.inv_k2
        di = (self.ka * ui + self.kb * vi) * self.inv_k2
        ur, ui = ur - self.ka * dr, ui - self.ka * di
        vr, vi = vr - self.kb * dr, vi - self.kb * di

        u = self.dft.irfft2(ur, ui)
        v = self.dft.irfft2(vr, vi)
        uv = jnp.stack((u, v), axis=-3)

        speed = jnp.sqrt(jnp.sum(uv**2, axis=-3, keepdims=True))
        peak = jnp.max(speed, axis=(-2, -1), keepdims=True)

        return uv * (max_velocity / peak)

    # -- Observation operators (API parity with sda/mcs.py:340-375) --------

    coarsen = staticmethod(ops.coarsen)
    upsample = staticmethod(ops.upsample)
    vorticity = staticmethod(ops.vorticity)
