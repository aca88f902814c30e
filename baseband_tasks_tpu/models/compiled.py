"""Scan-driven compiled execution of lazy stream chains.

The lazy Stream API (base.py) drives each node's frame from the host —
right for interactive use, wrong for production throughput (every stage is
a separate dispatch).  :class:`CompiledPipeline` walks a task graph and
compiles the whole thing into a single per-block step function, then
drives it with ``jax.lax.scan`` over time blocks, with overlap-save pads
carried as scan state instead of re-read — the declarative
"pipeline graph → scan over blocks" design of SURVEY.md §7.

Supported graphs:

* linear sequences of ``TaskBase`` subclasses whose ``task`` is a pure
  device function (Channelize, Dechannelize, Square, Power, Real2Complex,
  Task, SetAttribute, Convolve, Disperse/Dedisperse, ShiftAndResample,
  ShiftSamples, PFBs...);
* multi-input graphs: ``CombineStreamsBase`` nodes (CombineStreams,
  Concatenate, Stack) join several such chains; the compiled step takes
  one source block per input stream (reference combining.py:11-128).
  Branches may arrive with different streaming delays (unequal pads) and
  start offsets: both are absorbed as per-source read offsets, provided
  the required shifts are integral in source samples;
* ``GetSlice`` time slices anywhere in the graph: a slice is a pure
  shift of the stream timeline, so it compiles to a per-source read
  offset (``source_offsets``) rather than device work; the slice's
  ``stop`` is not enforced — the scan processes however many blocks the
  caller feeds it (reference shaping.py:358-416);
* a trailing ``Integrate`` / ``Fold`` / ``PulseStack`` reduction: its
  per-sample bin assignment is evaluated on the host at two-double Phase
  precision (reference integration.py:174-228,380-395), shipped to the
  device as per-block segment-id planes, and accumulated across the scan
  with ``segment_sum`` — so folding is part of the single compiled loop
  instead of a separate host-driven pass.

Streaming semantics: each padded stage carries its last ``pad`` input
samples; it therefore needs one window of history before its output
matches the offline (eager) computation.  ``warmup`` gives the number of
leading output samples affected by the zero-initialized carries; outputs
beyond it are identical to the eager chain's.

Exactness: when every padded stage's ``samples_per_frame`` divides its
``pad``, each streaming window [k·spf − pad, k·spf + spf) coincides with
an eager frame window, so compiled output equals the eager output delayed
by ``delay`` samples *to float roundoff* — not just up to overlap-save
truncation leakage.  For other frame sizes the windows sit at different
offsets and outputs agree only to the task's leakage level (for chirp
tasks, the Gibbs-tail margin).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

import jax
import jax.numpy as jnp

from ..base import BaseTaskBase, PaddedTaskBase, SetAttribute, TaskBase
from ..combining import CombineStreamsBase
from ..integration import Fold, Integrate
from ..shaping import GetSlice
from ..utils import units as u

__all__ = ["CompiledPipeline"]


class _Stage:
    __slots__ = ("node", "padded", "pad", "in_block", "out_block",
                 "in_sample_shape", "in_dtype", "fused", "skip")

    def __init__(self, node, padded, pad, in_block, out_block):
        self.node = node
        self.padded = padded
        self.pad = pad
        self.in_block = in_block
        self.out_block = out_block
        self.in_sample_shape = node.ih.sample_shape
        self.in_dtype = node.ih.dtype
        self.fused = None   # execution-override object (pair fusions)
        self.skip = False   # stage absorbed into a neighbor's fusion


def decode_segment_ids(idf):
    """f32 segment-id planes -> int32 segment ids (the axon boundary
    transfers float32 only; two planes carry (coarse, fine) bins)."""
    if idf.shape[-1] == 2:
        return (idf[..., 0].astype(jnp.int32) << 12) \
            | idf[..., 1].astype(jnp.int32)
    return idf[..., 0].astype(jnp.int32)


def init_reduction_acc(red, sample_shape, n_seg):
    """Zeroed (sums, counts) accumulators for an absorbed reduction.
    Masked reductions carry per-cell counts (the sample shape)."""
    from ..utils.device import device_zeros
    masked = bool(getattr(red, "_masked", False))
    return (device_zeros((n_seg + 1,) + tuple(sample_shape),
                         red._acc_dtype()),
            device_zeros((n_seg + 1,) + (tuple(sample_shape) if masked
                                         else ()), jnp.int32))


def make_reduction_update(red):
    """The ONE absorbed-reduction accumulator, shared by
    CompiledPipeline.run_fn, ShardedPipeline, and StreamRunner —
    ``update(sums, counts, y, seg) -> (sums, counts)``.  With a masked
    reduction, NaN-flagged cells (rfi.py fill=nan) drop out per cell."""
    acc_dtype = red._acc_dtype()
    masked = bool(getattr(red, "_masked", False))

    def update(sums, counts, y, seg):
        n = sums.shape[0]
        if masked:
            valid = jnp.isfinite(y)
            y = jnp.where(valid, y, 0)
            counts = counts + jax.ops.segment_sum(
                valid.astype(jnp.int32), seg, num_segments=n)
        else:
            counts = counts + jax.ops.segment_sum(
                jnp.ones(y.shape[0], jnp.int32), seg, num_segments=n)
        sums = sums + jax.ops.segment_sum(
            y.astype(acc_dtype), seg, num_segments=n)
        return sums, counts

    return update


def _lcm(a, b):
    return int(np.lcm(int(a), int(b)))


def _pads_on_grid(node):
    """True when the node's pow2 window has pads on the four-step N2
    grid (the pallas-engine constructors arrange this)."""
    from ..ops.dedisperse_pallas import _is_pow2, split_n
    n = node._padded_samples_per_frame
    if not _is_pow2(n):
        return False
    n2 = split_n(n)[1]
    return node._pad_start % n2 == 0 and node._pad_end % n2 == 0


class _FusedDisperseDechan:
    """Execution fusion of ``Disperse(engine='pallas') → Dechannelize``.

    The dechannelize inverse-DFT is a lane-axis mix, so it rides the
    dedispersion's last kernel as an MXU matmul (``post``) — the pair
    costs the same three HBM passes as dedispersion alone, and the
    overlap-save pads are discarded in-kernel (reference
    dispersion.py:135-139 + channelize.py:90 in one program).
    """

    def __init__(self, disp, dech):
        from ..ops.spectral_filter import lane_dft_mats
        self.disp = disp
        self.dech = dech
        self.post = lane_dft_mats(dech.n, inverse=True)

    @staticmethod
    def can_fuse(disp, dech):
        from ..channelize import Dechannelize
        from ..dispersion import Disperse
        return (isinstance(disp, Disperse)
                and isinstance(dech, Dechannelize)
                and getattr(disp, "engine", None) == "pallas"
                and dech.ih is disp
                and len(disp.sample_shape) == 1
                and dech.n == disp.sample_shape[0]
                and np.dtype(dech.dtype).kind == "c"
                and not dech._fft.ortho
                and _pads_on_grid(disp))

    def task(self, window):
        x = jnp.asarray(window).astype(jnp.complex64)
        yr, yi = self.disp._task_pallas_planes(
            jnp.real(x), jnp.imag(x), post=self.post)
        return jax.lax.complex(yr, yi).reshape(-1).astype(self.dech.dtype)

    def task_planes(self, pair):
        if pair[1] is None:
            return NotImplemented
        yr, yi = self.disp._task_pallas_planes(pair[0], pair[1],
                                               post=self.post)
        return yr.reshape(-1), yi.reshape(-1)

    def task_stream(self, carry_pair, x_pair, scale=None):
        yr, yi = self.disp._task_pallas_stream(carry_pair, x_pair,
                                               scale=scale, post=self.post)
        return yr.reshape(-1), yi.reshape(-1)


class _FusedPFBForward:
    """Execution fusion of ``_PolyphaseFIR → Channelize`` — the forward
    polyphase filter bank (reference pfb.py:103-154) as ONE pallas HBM
    pass (ops/pfb_pallas.py).

    XLA's formulation re-reads the padded window once per tap for the
    FIR (measured 2.6 ms of the 2.96 ms stage at m=2^14) and relayouts
    around the channelizing DFT's middle-axis matmuls; the kernel does
    the tap-sum in VMEM and the DFT as a flat F ⊗ I_reps lane matmul on
    the otherwise-idle MXU.

    ``with_dft=False`` (see :class:`_FusedPolyphaseFIR`) emits the raw
    tap-sum instead, for round-trip graphs whose downstream IDFT
    cancelled the DFT.
    """

    def __init__(self, fir, chan, with_dft=True):
        from ..ops.dft_matmul import _expanded_mats
        self.fir = fir
        self.chan = chan
        self.with_dft = with_dft
        n = chan.n
        extra = fir.ih.sample_shape
        self.reps = int(np.prod(extra, dtype=int)) if extra else 1
        self.n = n
        self.L = n * self.reps
        taps = np.asarray(fir._taps).reshape(fir._n_tap, n)
        self.taps_lanes = np.repeat(taps, self.reps, axis=1)
        self.mats = (_expanded_mats(n, self.reps, "forward")
                     if with_dft else (None, None))

    @staticmethod
    def can_fuse(fir, chan):
        from ..channelize import Channelize
        from ..ops.pfb_pallas import forward_geometry_ok
        from ..pfb import _PolyphaseFIR
        if not (isinstance(fir, _PolyphaseFIR)
                and isinstance(chan, Channelize)
                and chan.ih is fir
                and np.dtype(fir.ih.dtype).kind == "c"
                and not chan._fft.ortho
                and chan.n == fir._n):
            return False
        extra = fir.ih.sample_shape
        reps = int(np.prod(extra, dtype=int)) if extra else 1
        m = fir.samples_per_frame // fir._n
        return forward_geometry_ok(m, fir._n * reps, fir._n_tap)

    def _shape_out(self, y):
        return y.reshape((-1,) + self.chan.sample_shape)

    def task(self, window):
        y = self.fir.task(window)
        return self.chan.task(y) if self.with_dft else self._shape_out(y)

    def task_planes(self, pair):
        y = self.fir.task_planes(pair)
        if y is NotImplemented:
            return NotImplemented
        if self.with_dft:
            return self.chan.task_planes(y)
        return (self._shape_out(y[0]),
                None if y[1] is None else self._shape_out(y[1]))

    def task_stream(self, carry_pair, x_pair, scale=None):
        from ..ops.pfb_pallas import (choose_block_rows,
                                      pfb_forward_stream)
        n, L = self.n, self.L
        m = x_pair[0].shape[0] // n
        if x_pair[0].shape[0] % n or not choose_block_rows(m, 8):
            return NotImplemented
        k = self.fir._n_tap - 1
        yr, yi = pfb_forward_stream(
            carry_pair[0].reshape(k, L), carry_pair[1].reshape(k, L),
            x_pair[0].reshape(m, L), x_pair[1].reshape(m, L),
            self.taps_lanes, self.mats[0], self.mats[1],
            n_tap=self.fir._n_tap, scale=scale)
        return self._shape_out(yr), self._shape_out(yi)


class _FusedPolyphaseFIR(_FusedPFBForward):
    """The forward-PFB half of the ROUND-TRIP quad fusion
    ``_PolyphaseFIR → Channelize → Dechannelize → InversePolyphaseFilterBank``.

    The channelizing DFT and the dechannelize inverse-DFT are exact
    adjoints (same n, unscaled forward / 1-n inverse, same lane
    expansion), so in the composed graph they cancel analytically: the
    polyphase branches z_j[k] = sum_t h[t, j] x[(k+t)n + j] that the
    FIR produces are *exactly* the dechannelized stream the Wiener
    deconvolution consumes (reference pfb.py:243-255).  This stage
    therefore emits the raw tap-sum (one pallas HBM pass, no lane
    matmul); the paired `_FusedDechanInvPFB(use_pre=False)` skips its
    pre matmul.  Mathematically identical to the unfused chain — with
    two fewer f32 roundings.
    """

    def __init__(self, fir, chan):
        super().__init__(fir, chan, with_dft=False)


class _FusedDechanInvPFB:
    """Execution fusion of ``Dechannelize → InversePolyphaseFilterBank``.

    A lane-axis mix commutes with the row-axis FFT, so the dechannelize
    inverse-DFT becomes a ``pre`` matmul inside the deconvolution's
    first kernel; the overlap-save carry moves to the (smaller) spectra
    domain (reference pfb.py:157-255 with channelize.py:90 absorbed).
    """

    def __init__(self, dech, inv, use_pre=True):
        from ..ops.spectral_filter import expand_lane_mats, lane_dft_mats
        self.dech = dech
        self.inv = inv
        extra = dech.ih.sample_shape[1:]
        self.reps = int(np.prod(extra, dtype=int)) if extra else 1
        if use_pre:
            mats = lane_dft_mats(inv._n, inverse=True)
            self.pre = expand_lane_mats(mats, self.reps) \
                if self.reps > 1 else mats
        else:
            # round-trip quad fusion: the upstream forward DFT was
            # cancelled against this IDFT, so the incoming planes are
            # already the polyphase branches
            self.pre = None

    @staticmethod
    def can_fuse(dech, inv):
        from ..channelize import Dechannelize
        from ..ops.dedisperse_pallas import _is_pow2, split_n
        from ..pfb import InversePolyphaseFilterBank
        if not (isinstance(dech, Dechannelize)
                and isinstance(inv, InversePolyphaseFilterBank)
                and getattr(inv, "engine", None) == "pallas"
                and inv.ih is dech
                and dech.ih.sample_shape
                and dech.ih.sample_shape[0] == inv._n == dech.n
                and np.dtype(dech.dtype).kind == "c"
                and not dech._fft.ortho
                and inv._pad_start % inv._n == 0
                and inv._pad_end % inv._n == 0):
            return False
        rows = inv._padded_samples_per_frame // inv._n
        if not _is_pow2(rows):
            return False
        n2 = split_n(rows)[1]
        return (inv._pad_start // inv._n) % n2 == 0 \
            and (inv._pad_end // inv._n) % n2 == 0

    def task(self, window):
        m = window.shape[0]
        z = jnp.asarray(window).astype(jnp.complex64).reshape(m, -1)
        yr, yi = self.inv._task_pallas_planes(
            jnp.real(z), jnp.imag(z), pre=self.pre)
        out = jax.lax.complex(yr, yi).reshape(
            (-1,) + self.inv.sample_shape)
        if self.inv.dtype.kind != "c":
            out = out.real
        return out.astype(self.inv.dtype)

    def _shape_out(self, yr, yi):
        yr = yr.reshape((-1,) + self.inv.sample_shape)
        if self.inv.dtype.kind != "c":
            return yr, None
        return yr, yi.reshape((-1,) + self.inv.sample_shape)

    def task_planes(self, pair):
        if pair[1] is None:
            return NotImplemented
        m = pair[0].shape[0]
        yr, yi = self.inv._task_pallas_planes(
            pair[0].reshape(m, -1), pair[1].reshape(m, -1), pre=self.pre)
        return self._shape_out(yr, yi)

    def task_stream(self, carry_pair, x_pair, scale=None):
        m = x_pair[0].shape[0]
        mc = carry_pair[0].shape[0]
        yr, yi = self.inv._task_pallas_planes(
            x_pair[0].reshape(m, -1), x_pair[1].reshape(m, -1),
            pre=self.pre, scale=scale,
            carry=(carry_pair[0].reshape(mc, -1),
                   carry_pair[1].reshape(mc, -1)))
        return self._shape_out(yr, yi)


class CompiledPipeline:
    """Compile a lazy task graph into one jitted block step.

    Parameters
    ----------
    tail : stream
        The graph's last node; its input ancestry is walked up to the
        source stream(s).  Sources themselves are *not* compiled — blocks
        of source samples are the step input (one block per source).  A
        trailing Integrate/Fold/PulseStack is absorbed as an in-scan
        reduction (see module docstring).
    """

    def __init__(self, tail, *, block_samples=None, fuse=True,
                 packed=False):
        self._run_cache = {}  # n_blocks -> compiled run closure
        # Split off a trailing reduction (Integrate and subclasses).
        self.reduction = None
        if isinstance(tail, Integrate):
            self.reduction = tail
            tail = tail.ih
        self._tail = tail

        # -- walk the graph into a post-order program --------------------
        # entries: ("input", source_index) pushes a source block;
        #          ("op", _Stage) transforms the top of stack;
        #          ("combine", node, k) pops k values, pushes task(list).
        program = []
        sources = []

        def build(node):
            if isinstance(node, CombineStreamsBase):
                for ih in node.ihs:
                    build(ih)
                program.append(("combine", node, len(node.ihs)))
            elif isinstance(node, BaseTaskBase):
                build(node.ih)
                program.append(("entry", node))
            else:
                sources.append(node)
                program.append(("input", len(sources) - 1))

        build(tail)
        if len(program) == 1:
            raise ValueError("tail has no task nodes to compile")
        self.sources = sources
        self.source = sources[0]

        # -- block-size constraints, in units of the tail block B --------
        # Every point p in the program carries block_p = coef_p * B (an
        # exact Fraction of the unknown tail block).  Non-padded
        # rate-changing stages add a granularity requirement (whole groups
        # of `q` inputs); padded stages pin block_p to samples_per_frame.
        # Walk tail->sources to get coefficients, then sources->tail to
        # collect constraints.
        stages = []       # _Stage in program order (entry ops only)
        pinned = None     # exact B from padded stages
        constraints = []  # (coef, granularity): coef*B % gran == 0
        delay_stack = []
        warmup_stack = []
        coef_stack = []
        srcs_stack = []   # source indices feeding the branch
        source_offsets = [0] * len(sources)

        for kind, *rest in program:
            if kind == "input":
                coef_stack.append(Fraction(1))
                delay_stack.append(Fraction(0))
                warmup_stack.append(Fraction(0))
                srcs_stack.append([rest[0]])
                continue
            if kind == "combine":
                node, k = rest
                coefs = coef_stack[-k:]
                delays = delay_stack[-k:]
                warmups = warmup_stack[-k:]
                branch_srcs = srcs_stack[-k:]
                del coef_stack[-k:], delay_stack[-k:], srcs_stack[-k:]
                del warmup_stack[-k:]
                srcs_stack.append([i for lst in branch_srcs for i in lst])
                if len(set(coefs)) != 1:
                    raise ValueError(
                        "combined branches arrive with different block "
                        "sizes; give their stages matching frame sizes")
                # Branches may arrive with different streaming delays
                # (pads consumed so far) and the eager node may align
                # them with per-branch start offsets.  Both reduce to a
                # per-branch timeline shift, absorbed by reading that
                # branch's sources later: with branch value at compiled
                # index t = eager_b[t - d_b + o_b*coef], combining
                # eager_b[t - D + offset_b] for a common D needs
                # o_b = (d_b + offset_b - D) / coef; D = min keeps all
                # o_b >= 0 (sources cannot be read before their start).
                totals = [d + off for d, off in zip(delays, node._offsets)]
                d_common = min(totals)
                for lst, tot in zip(branch_srcs, totals):
                    extra = tot - d_common
                    if not extra:
                        continue
                    shift = Fraction(extra) / coefs[0]
                    if shift.denominator != 1:
                        raise ValueError(
                            f"combined branches misaligned by {extra} "
                            f"samples = {float(shift)} source samples — "
                            f"not a whole number; adjust pads/slices so "
                            f"branch shifts are integral in source "
                            f"samples")
                    for i in lst:
                        source_offsets[i] += int(shift)
                coef_stack.append(coefs[0])
                delay_stack.append(d_common)
                # validity is set by the slowest branch's carries: its
                # first max(w_b) samples are garbage regardless of how
                # the timelines were shifted into alignment
                warmup_stack.append(max(warmups))
                stages.append(_CombineStage(node, k))
                continue
            n = rest[0]
            if isinstance(n, SetAttribute):
                stages.append(_Stage(n, False, 0, None, None))
                continue
            if isinstance(n, GetSlice):
                # A time slice is a pure shift: start samples at this
                # point of the chain map back to start/coef source
                # samples, folded into the branch's read offset.
                shift = Fraction(n._start) / coef_stack[-1]
                if shift.denominator != 1:
                    raise ValueError(
                        f"GetSlice start {n._start} is not a whole "
                        f"number of source samples (stage rate ratio "
                        f"{coef_stack[-1]}); slice at a multiple of "
                        f"{coef_stack[-1].numerator} samples instead")
                for i in srcs_stack[-1]:
                    source_offsets[i] += int(shift)
                stages.append(_Stage(n, False, 0, None, None))
                continue
            if isinstance(n, PaddedTaskBase):
                # block at this point must equal samples_per_frame
                need = Fraction(n.samples_per_frame) / coef_stack[-1]
                if need.denominator != 1:
                    raise ValueError("incompatible frame sizes along the "
                                     "chain")
                need = int(need)
                if pinned is None:
                    pinned = need
                elif pinned != need:
                    raise ValueError(
                        f"padded stages disagree on block size: "
                        f"{pinned} vs {need} source samples; "
                        f"construct them with matching samples_per_frame")
                stages.append(_Stage(n, True, n.pad_start + n.pad_end,
                                     n.samples_per_frame,
                                     n.samples_per_frame))
                delay_stack[-1] += n.pad_start + n.pad_end
                warmup_stack[-1] += n.pad_start + n.pad_end
                continue
            if isinstance(n, TaskBase):
                import inspect
                if "task" in n.__dict__ and inspect.ismethod(n.task):
                    # method-style Task callables receive the node and
                    # typically read tell()/time — position-dependent
                    # state a traced step would freeze at construction
                    raise ValueError(
                        "cannot compile a Task with a method-style "
                        "callable (it sees the stream position, which "
                        "is not defined inside the compiled scan); "
                        "generate position-dependent data in the source "
                        "(StreamGenerator) instead")
                ratio = Fraction(n.samples_per_frame,
                                 n._ih_samples_per_frame)
                stages.append(_Stage(n, False, 0, ratio.denominator,
                                     ratio.numerator))
                # tasks with an internal block grid (e.g. the spectral-
                # kurtosis excision's n-sample decision blocks) declare
                # it via _task_granularity so scan blocks land on that
                # grid and compiled == eager decision-for-decision
                group = int(getattr(n, "_task_granularity", 1))
                constraints.append((coef_stack[-1],
                                    _lcm(ratio.denominator, group)))
                coef_stack[-1] *= ratio
                delay_stack[-1] *= ratio
                warmup_stack[-1] *= ratio
                continue
            raise ValueError(f"cannot compile node {type(n).__name__}")

        tail_coef = coef_stack[-1]
        delay = delay_stack[-1]
        warmup = max(warmup_stack[-1], delay)
        # Block at point p is coef_p * B with B the (common) source block.
        # coef_p*B must be an integer multiple of gran for each constraint
        # (n/d)*B ≡ 0 mod g  ⇔  B multiple of g·d / gcd(n, g·d).
        from math import gcd
        B = 1
        for coef, gran in constraints:
            n_, d_ = coef.numerator, coef.denominator
            B = _lcm(B, gran * d_ // gcd(n_, gran * d_))
        if pinned is not None:
            if pinned % B:
                raise ValueError(
                    f"block of {pinned} source samples does not hold "
                    f"whole groups for all rate-changing stages (need a "
                    f"multiple of {B})")
            B = pinned
        if block_samples is not None:
            # caller-chosen block (e.g. to amortize per-step dispatch
            # cost); must keep every constraint and any pinned size
            if block_samples % B or (pinned is not None
                                     and block_samples != pinned):
                raise ValueError(
                    f"block_samples={block_samples} incompatible: needs "
                    f"a multiple of {B}"
                    + (f" and padded stages pin {pinned}"
                       if pinned is not None else ""))
            B = int(block_samples)

        self.program = program
        self.stages = stages
        #: per-source extra read offset (source samples) from GetSlice
        self.source_offsets = source_offsets
        self.block_samples = B
        self._tail_coef = tail_coef
        t = tail_coef * B
        if t.denominator != 1:
            raise ValueError("tail block is not integral; incompatible "
                             "frame sizes")
        self.tail_block = int(t)
        self.delay = delay  # exact, in tail samples (may be fractional if
        #                     a rate change follows a padded stage)
        self.warmup = int(np.ceil(warmup))

        # -- packed-payload ingest ----------------------------------------
        # With packed=True, sources that expose read_packed /
        # packed_decode_fn (e.g. io/vdif.py) ship raw payload bits as f32
        # carriers and are decoded *inside* the compiled step
        # (ops/unpack_device.py) — 4-16x fewer boundary bytes and no host
        # decode, matching the reference's decode-inside-the-pipeline
        # design (reference io/hdf5/payload.py:164-178).
        self.packed = bool(packed)
        self._decoders = [None] * len(sources)
        if packed:
            for i, (src, extra) in enumerate(zip(sources, source_offsets)):
                make = getattr(src, "packed_decode_fn", None)
                if make is None:
                    continue  # this source stays on the float path
                align = src.packed_alignment
                if self.block_samples % align or extra % align:
                    raise ValueError(
                        f"packed ingest needs frame-aligned blocks: "
                        f"block_samples {self.block_samples} and source "
                        f"offset {extra} must be multiples of the file's "
                        f"{align} samples/frame")
                self._decoders[i] = make()
            if not any(d is not None for d in self._decoders):
                raise ValueError(
                    "packed=True but no source supports packed reads "
                    "(needs read_packed/packed_decode_fn)")

        if fuse:
            self._apply_fusions()

    def _apply_fusions(self):
        """Peephole pass: fuse adjacent stage pairs whose second half is
        a pure lane-axis mix the pallas kernels can absorb.  Execution
        only — all block/delay bookkeeping (done above) is unchanged,
        and the original nodes still work eagerly."""
        stages = self.stages
        # round-trip quad: the forward channelizing DFT and the inverse
        # dechannelize IDFT are exact adjoints and cancel analytically
        for i in range(len(stages) - 3):
            a, b, c, d = stages[i:i + 4]
            if not all(isinstance(st, _Stage) for st in (a, b, c, d)) \
                    or any(st.skip or st.fused for st in (a, b, c, d)):
                continue
            if (_FusedPFBForward.can_fuse(a.node, b.node)
                    and _FusedDechanInvPFB.can_fuse(c.node, d.node)
                    and c.node.ih is b.node
                    and c.node.n == b.node.n):
                a.fused = _FusedPolyphaseFIR(a.node, b.node)
                b.skip = c.skip = True
                d.fused = _FusedDechanInvPFB(c.node, d.node,
                                             use_pre=False)
                n = d.node._n
                d.pad = (d.node.pad_start + d.node.pad_end) // n
                d.in_sample_shape = b.node.sample_shape
                d.in_dtype = b.node.dtype
        for i in range(len(stages) - 1):
            a, b = stages[i], stages[i + 1]
            if not (isinstance(a, _Stage) and isinstance(b, _Stage)) \
                    or a.skip or b.skip or a.fused or b.fused:
                continue
            if _FusedDisperseDechan.can_fuse(a.node, b.node):
                a.fused = _FusedDisperseDechan(a.node, b.node)
                b.skip = True
            elif _FusedPFBForward.can_fuse(a.node, b.node):
                a.fused = _FusedPFBForward(a.node, b.node)
                b.skip = True
            elif _FusedDechanInvPFB.can_fuse(a.node, b.node):
                b.fused = _FusedDechanInvPFB(a.node, b.node)
                a.skip = True
                # the carry moves to the spectra domain: pad rows of the
                # (channelized) input instead of pad samples of the
                # dechannelized stream
                n = b.node._n
                b.pad = (b.node.pad_start + b.node.pad_end) // n
                b.in_sample_shape = a.node.ih.sample_shape
                b.in_dtype = a.node.ih.dtype

    # -- the compiled step ----------------------------------------------
    def init_carry(self, planes=False):
        carries = []
        for st in self.stages:
            if isinstance(st, _Stage) and st.padded:
                shape = (st.pad,) + st.in_sample_shape
                if planes:
                    z = jnp.zeros(shape, jnp.float32)
                    carries.append(
                        (z, z if np.dtype(st.in_dtype).kind == "c"
                         else None))
                else:
                    # f32-safe creation: eager jnp.zeros(complex) puts
                    # the complex fill scalar across the boundary
                    from ..utils.device import device_zeros
                    carries.append(device_zeros(shape, st.in_dtype))
        return tuple(carries)

    #: node attributes holding device-resident cache arrays
    _CACHE_ATTRS = ("_chirp_cache", "_ft_response_cache", "_gain_cache",
                    "_storage_chirp_cache", "_storage_response_cache",
                    "_storage_gain_cache", "_lo_cache", "_phase_cache",
                    "_taps", "_mat", "_rel_index")

    def _prepare_caches(self):
        """Materialize lazy device caches eagerly: built inside a traced
        step they would capture tracers (chirps, response FTs, gains)."""
        for st in self.stages:
            if not isinstance(st, _Stage):
                continue
            n = st.node
            if getattr(n, "_chirp_cache", 1) is None:
                n._chirp_cache = n._chirp()
            if getattr(n, "_ft_response_cache", 1) is None:
                n._ft_response_cache = n._ft_response()
            if getattr(n, "_gain_cache", 1) is None and \
                    hasattr(n, "_make_gain") and \
                    getattr(n, "engine", None) != "pallas":
                # (the pallas engine reads _storage_gain_cache instead;
                # building both would ship an unused ~rows x n complex
                # array through every jit call)
                n._gain_cache = n._make_gain(
                    n._padded_samples_per_frame // n._n)
            from ..utils.device import device_complex
            if getattr(n, "_lo_factor", None) is not None and \
                    getattr(n, "_lo_cache", 1) is None:
                n._lo_cache = device_complex(np.broadcast_to(
                    n._lo_factor, n.sample_shape).copy())
            if getattr(n, "_phase_factor", None) is not None and \
                    getattr(n, "_phase_cache", 1) is None:
                n._phase_cache = device_complex(np.broadcast_to(
                    n._phase_factor, n.sample_shape).copy())
            # pallas-engine storage-order caches (Disperse / Convolve);
            # only that engine's task() consumes them, and the split-radix
            # layout requires a pow2-splittable window, so never build them
            # for engine='xla' nodes (whose next_fast_len windows need not
            # split).
            if getattr(n, "engine", None) == "pallas":
                if getattr(n, "_storage_chirp_cache", 1) is None:
                    n._storage_chirp_cache = n._storage_chirp()
                if getattr(n, "_storage_response_cache", 1) is None:
                    n._storage_response_cache = n._storage_response()
                if getattr(n, "_storage_gain_cache", 1) is None:
                    n._storage_gain_cache = n._storage_gain()

    def cache_bindings(self):
        """(bindings, leaves): every device cache array of the graph, to
        be passed as explicit jit arguments.

        A device array captured as a jit *closure constant* is fetched
        back to the host for MLIR constant embedding — a complex fetch,
        which restricted-transfer backends (the axon TPU tunnel) reject.
        Passing the caches as arguments keeps them device-resident.
        ``bindings`` is a list of (node, attr, treedef); ``leaves`` the
        flat tuple of arrays in matching order.
        """
        self._prepare_caches()
        bindings = []
        leaves = []
        for st in self.stages:
            if not isinstance(st, _Stage):
                continue
            n = st.node
            for attr in self._CACHE_ATTRS:
                v = getattr(n, attr, None)
                if v is None or isinstance(v, (int, float)):
                    continue
                flat, treedef = jax.tree_util.tree_flatten(v)
                if flat and all(isinstance(x, jax.Array) for x in flat):
                    bindings.append((n, attr, treedef, len(flat)))
                    leaves.extend(flat)
        return bindings, tuple(leaves)

    @staticmethod
    def _bind(bindings, leaves):
        """Context manager: temporarily set the cache attributes to
        (possibly traced) values during step tracing."""
        import contextlib

        @contextlib.contextmanager
        def ctx():
            olds = []
            i = 0
            for n, attr, treedef, k in bindings:
                olds.append(getattr(n, attr))
                setattr(n, attr, jax.tree_util.tree_unflatten(
                    treedef, list(leaves[i:i + k])))
                i += k
            try:
                yield
            finally:
                for (n, attr, _, _), old in zip(bindings, olds):
                    setattr(n, attr, old)

        return ctx()

    def cached_step(self):
        """(step_c, cache_leaves): like :meth:`step_fn`, but the step
        takes the flat cache tuple as a third argument so callers can
        thread it through jit boundaries:

            step_c, caches = cp.cached_step()
            @jax.jit
            def run(blocks, *caches):
                carry, ys = lax.scan(
                    lambda c, x: step_c(c, x, caches), carry0, blocks)
            run(blocks, *caches)
        """
        step = self.step_fn()
        bindings, leaves = self.cache_bindings()

        def step_c(carry, x, caches):
            with self._bind(bindings, caches):
                return step(carry, x)

        return step_c, leaves

    def step_fn(self, pad_hook=None):
        """(carry, blocks) -> (carry, out_block), jittable.

        ``blocks`` is a single source block for single-source graphs, or
        a tuple of blocks (program input order) for multi-source graphs.

        ``pad_hook(stage, carry_entry, x) -> (window, new_carry_entry)``
        overrides how a padded stage assembles its overlap-save window
        from the carried history and the new block — the sharded
        executor (models/sharded.py) substitutes a ppermute halo
        exchange here; the default is the single-device concatenate.
        """
        self._prepare_caches()
        stages = self.stages
        program = self.program
        multi = len(self.sources) > 1

        def default_hook(st, c, x):
            window = jnp.concatenate([c, x], axis=0)
            return window, (window[-st.pad:] if st.pad else window[:0])

        hook = pad_hook if pad_hook is not None else default_hook

        decoders = self._decoders

        def step(carry, xs):
            inputs = xs if multi else (xs,)
            stack = []
            new_carry = []
            ci = 0
            si = 0
            for kind, *rest in program:
                if kind == "input":
                    x = inputs[rest[0]]
                    dec = decoders[rest[0]]
                    stack.append(dec(x) if dec is not None else x)
                    continue
                st = stages[si]
                si += 1
                if isinstance(st, _CombineStage):
                    args = stack[-st.k:]
                    del stack[-st.k:]
                    stack.append(st.node.task(list(args)))
                    continue
                if st.skip or isinstance(st.node, (SetAttribute, GetSlice)):
                    continue
                fn = st.fused if st.fused is not None else st.node
                x = stack.pop()
                if st.padded:
                    window, nc = hook(st, carry[ci], x)
                    new_carry.append(nc)
                    ci += 1
                    x = fn.task(window)
                else:
                    x = fn.task(x)
                stack.append(x)
            return tuple(new_carry), stack[-1]

        return step

    # -- planes-interchange step ------------------------------------------
    def planes_step(self):
        """(carry, xs, scale) -> (carry, (yr, yi)): the step with values
        flowing as separate float32 re/im planes.

        Complex data as flat f32 planes is the TPU-native interchange:
        the kernels read planes directly (no split/recombine passes), the
        axon-style device boundary only transfers f32, and flat planes
        stream at ~2x the HBM bandwidth of packed complex on v5e.  A
        plane pair is ``(re, im)`` with ``im = None`` for real streams.

        Stages that implement ``task_planes`` (pallas Disperse, the
        fused pairs, (De)Channelize via MXU matmuls, real-linear FIRs)
        run natively; any other stage falls back through one complex
        recombination.  ``scale`` (scalar or None) multiplies the input
        of the first compute stage — inside the kernel (SMEM) when that
        stage is a streaming fusion, so benchmark-style per-iteration
        variation costs no extra HBM pass.  Streaming fused stages also
        skip the window concatenate: the overlap-save carry is passed to
        the kernel as a separate buffer.
        """
        self._prepare_caches()
        if any(d is not None for d in self._decoders):
            raise NotImplementedError(
                "packed ingest is not wired into the planes-interchange "
                "step; use the normal step (packed carriers are already "
                "float32 on the boundary)")
        stages = self.stages
        program = self.program
        multi = len(self.sources) > 1

        def to_pair(x):
            if isinstance(x, tuple):
                return x
            x = jnp.asarray(x)
            if jnp.iscomplexobj(x):
                return jnp.real(x), jnp.imag(x)
            return x, None

        def to_complex(pair):
            re, im = pair
            return re if im is None else jax.lax.complex(re, im)

        def scaled(pair, s):
            if s is None:
                return pair
            return (pair[0] * s, None if pair[1] is None else pair[1] * s)

        def tail_rows(plane, pad):
            # overlap-save tail.  For NARROW sample shapes the direct
            # row slice makes XLA materialize the whole plane in a
            # lane-padded layout — 64x HBM for a (n, 2) shape
            # (measured: two 15.9 GB copies of 254 MB planes at the
            # config3big window, OOM on 16 GB) — so those go through
            # the FLAT view.  For lane-aligned planes (>= 128 trailing
            # elements) the flat reshape is itself a full relayout
            # copy per step (measured: config3's 512-lane chain halved
            # to 2.6e9 samples/s when flattened unconditionally,
            # round 5), so they keep the direct slice.
            per = int(np.prod(plane.shape[1:], dtype=int)) \
                if plane.ndim > 1 else 1
            if per >= 128:
                return plane[-pad:]
            flat = plane.reshape(-1)
            cut = flat.shape[0] - pad * per
            return jax.lax.slice_in_dim(flat, cut, flat.shape[0]) \
                .reshape((pad,) + plane.shape[1:])

        def step(carry, xs, scale=None):
            inputs = xs if multi else (xs,)
            stack = []
            new_carry = []
            ci = 0
            si = 0
            pending_scale = scale
            for kind, *rest in program:
                if kind == "input":
                    stack.append(to_pair(inputs[rest[0]]))
                    continue
                st = stages[si]
                si += 1
                if isinstance(st, _CombineStage):
                    args = [to_complex(p) for p in stack[-st.k:]]
                    del stack[-st.k:]
                    if pending_scale is not None:
                        args = [a * pending_scale for a in args]
                        pending_scale = None
                    stack.append(to_pair(st.node.task(args)))
                    continue
                if st.skip or isinstance(st.node, (SetAttribute, GetSlice)):
                    continue
                fn = st.fused if st.fused is not None else st.node
                x = stack.pop()
                if st.padded:
                    c = carry[ci]
                    ci += 1
                    stream_fn = getattr(fn, "task_stream", None)
                    if (stream_fn is not None and x[1] is not None
                            and c[1] is not None
                            and 0 < st.pad <= x[0].shape[0]):
                        y = stream_fn(c, x, scale=pending_scale)
                        if y is not NotImplemented:
                            # the kernel scales the BLOCK rows only, so
                            # the carried tail must be scaled here to
                            # hold its own iteration's values
                            tail = scaled((tail_rows(x[0], st.pad),
                                           tail_rows(x[1], st.pad)),
                                          pending_scale)
                            pending_scale = None
                            new_carry.append(tail)
                            stack.append(y)
                            continue
                    x = scaled(x, pending_scale)
                    pending_scale = None
                    wr = jnp.concatenate([c[0], x[0]], axis=0)
                    wi = None if x[1] is None else \
                        jnp.concatenate([jnp.zeros_like(c[0])
                                         if c[1] is None else c[1],
                                         x[1]], axis=0)
                    pad = st.pad
                    new_carry.append(
                        (wr[-pad:], None if wi is None else wi[-pad:])
                        if pad else (wr[:0], None if wi is None
                                     else wi[:0]))
                    x = (wr, wi)
                else:
                    x = scaled(x, pending_scale)
                    pending_scale = None
                y = NotImplemented
                planes_fn = getattr(fn, "task_planes", None)
                if planes_fn is not None:
                    y = planes_fn(x)
                if y is NotImplemented:
                    y = to_pair(fn.task(to_complex(x)))
                stack.append(y)
            return tuple(new_carry), stack[-1]

        return step

    def cached_planes_step(self):
        """(step_c, cache_leaves) for :meth:`planes_step`, with the
        device caches as explicit arguments (see :meth:`cached_step`):

            step_c(carry, xs, scale, caches)
        """
        step = self.planes_step()
        bindings, leaves = self.cache_bindings()

        def step_c(carry, xs, scale, caches):
            with self._bind(bindings, caches):
                return step(carry, xs, scale)

        return step_c, leaves

    # -- reduction (Integrate / Fold / PulseStack) -----------------------
    def _segment_ids(self, start, n):
        """Flat segment id per *eager-timeline* tail sample in
        [start, start+n), computed on the host at full (two-double) phase
        precision (reference integration.py:174-228,380-395).  Samples
        outside every bin (incl. negative warmup indices) get id
        ``n_segments`` — a trash segment dropped on device.  Returns
        (ids_int64, n_segments)."""
        red = self.reduction
        sample = np.arange(start, start + n, dtype=np.int64)
        rel = sample - red._ih_start
        fine = red.n_phase if _pulse_like(red) else 1
        edges = red._get_offsets(np.arange(red.shape[0] * fine + 1))
        time_bins = np.searchsorted(edges, rel, side="right") - 1
        n_time = len(edges) - 1
        valid = (rel >= edges[0]) & (rel < edges[-1])
        time_bins = np.clip(time_bins, 0, n_time - 1)
        if _fold_like(red):
            ih = red.ih
            ih_rate = ih.sample_rate.to_value(u.Hz)
            t0 = ih._tell_time(red._ih_start)
            t = t0 + u.Quantity(rel / ih_rate, u.s)
            from ..integration import _phase_to_cycles
            hi, lo = _phase_to_cycles(red._phase(t))
            frac = (hi - np.floor(hi)) + lo
            frac = frac - np.floor(frac)
            phase_bins = np.minimum((frac * red.n_phase).astype(np.int64),
                                    red.n_phase - 1)
            ids = time_bins * red.n_phase + phase_bins
            n_seg = n_time * red.n_phase
        else:
            ids = time_bins
            n_seg = n_time
        ids = np.where(valid, ids, n_seg)
        return ids, n_seg

    def segment_ids_f(self, n_blocks, tail_offset=0):
        """Device-ready per-block segment-id planes for the absorbed
        reduction: ``(ids_f, n_seg)`` with ``ids_f`` of shape
        ``(n_blocks, tail_block, 1 or 2)`` float32 (the axon device
        boundary transfers float32 only; ids >= 2^24 ship as an exact
        12-bit hi/lo split).  ``tail_offset`` shifts the eager timeline
        by whole tail samples (for resumed runs)."""
        ids_f, n_seg = self.segment_ids_np(n_blocks, tail_offset)
        return jnp.asarray(ids_f), n_seg

    def segment_ids_np(self, n_blocks, tail_offset=0):
        """:meth:`segment_ids_f`'s planes kept on the HOST (numpy).

        For consumers that slice per block while a reader thread is
        device_put-ing in parallel (StreamRunner): an eager getitem on
        a DEVICE array races a threaded put on the axon tunnel client
        (raises UNIMPLEMENTED; CLAUDE.md), while slicing numpy and
        handing the slice to a jitted call (jit dispatch transfers its
        arguments) is safe."""
        if self.delay != int(self.delay):
            raise ValueError(
                "cannot absorb a reduction after a fractional-delay "
                "chain; choose frame sizes with integral delay")
        ids, n_seg = self._segment_ids(tail_offset - int(self.delay),
                                       n_blocks * self.tail_block)
        # samples still inside the carry warmup map to valid eager
        # indices but hold garbage — trash them.  From tail_offset 0 the
        # first ``delay`` samples already land at negative eager indices
        # (invalid); a resumed run starts with fresh carries, so its full
        # ``warmup`` window is garbage.
        w_extra = (self.warmup - int(self.delay) if tail_offset == 0
                   else self.warmup)
        if w_extra > 0:
            ids = ids.copy()
            ids[:w_extra] = n_seg
        ids2 = ids.reshape(n_blocks, self.tail_block)
        if n_seg < (1 << 24):
            ids_f = ids2.astype(np.float32)[..., np.newaxis]
        else:
            ids_f = np.stack([(ids2 >> 12).astype(np.float32),
                              (ids2 & 0xFFF).astype(np.float32)],
                             axis=-1)
        return ids_f, n_seg

    def run_fn(self, n_blocks):
        """Jitted scan over ``n_blocks`` source blocks.

        Without a reduction, returns ``run(blocks) -> out`` where
        ``blocks`` has shape ``(n_blocks, block_samples) + sample_shape``
        per source (a tuple of such stacks for multi-source graphs) and
        ``out`` is the concatenated tail-rate output.

        With an absorbed reduction, returns
        ``run(blocks) -> (sums, counts)`` with the same bin layout as the
        eager node's non-averaged read ((bins, [n_phase,] ...) data and
        counts); averaging divides afterwards (`run_reduced` does both).

        The returned closure (and its jit executable) is cached per
        ``n_blocks``, so repeated calls with the same block count reuse
        one compile and one segment-id table.
        """
        cached = self._run_cache.get(int(n_blocks))
        if cached is not None:
            return cached
        step_c, cache_leaves = self.cached_step()
        red = self.reduction

        if red is None:
            @jax.jit
            def jrun(blocks, *caches):
                carry = self.init_carry()
                carry, ys = jax.lax.scan(
                    lambda c, x: step_c(c, x, caches), carry, blocks)
                return ys.reshape((-1,) + ys.shape[2:])

            fn = lambda blocks: jrun(blocks, *cache_leaves)  # noqa: E731
            self._run_cache[int(n_blocks)] = fn
            return fn

        # host-precomputed per-block segment ids (f32 planes: the axon
        # device boundary transfers float32 only).  Compiled sample k is
        # eager sample k - delay; warmup samples land in the trash bin.
        ids_f, n_seg = self.segment_ids_f(n_blocks)
        sample_shape = self._tail.sample_shape
        update = make_reduction_update(red)

        def red_step(carry, xs, caches):
            data_carry, sums, counts = carry[:-2], carry[-2], carry[-1]
            blocks, idf = xs
            new_carry, y = step_c(data_carry, blocks, caches)
            sums, counts = update(sums, counts, y,
                                  decode_segment_ids(idf))
            return new_carry + (sums, counts), 0

        @jax.jit
        def jrun(blocks, ids, *caches):
            carry = self.init_carry() + init_reduction_acc(
                red, sample_shape, n_seg)
            carry, _ = jax.lax.scan(
                lambda c, x: red_step(c, x, caches), carry,
                (blocks, ids))
            sums, counts = carry[-2], carry[-1]
            return (self._shape_reduced(sums[:-1]),
                    self._shape_reduced_counts(counts[:-1]))

        fn = lambda blocks: jrun(blocks, ids_f, *cache_leaves)  # noqa: E731
        self._run_cache[int(n_blocks)] = fn
        return fn

    def _shape_reduced(self, sums):
        red = self.reduction
        if _fold_like(red):
            return sums.reshape((-1, red.n_phase) + sums.shape[1:])
        if _pulse_like(red):
            return sums.reshape((-1, red.n_phase) + sums.shape[1:])
        return sums

    def _shape_reduced_counts(self, counts):
        red = self.reduction
        if _fold_like(red) or _pulse_like(red):
            # masked reductions carry per-cell counts (sample shape)
            return counts.reshape((-1, red.n_phase) + counts.shape[1:])
        return counts

    def run_reduced(self, blocks):
        """Run with the absorbed reduction and return what the eager
        node's averaged ``read`` would: sums/counts (or plain sums when
        ``average=False`` semantics are wanted, use :meth:`run_fn`)."""
        if self.reduction is None:
            raise ValueError("no reduction to run")
        if len(self.sources) == 1:
            blocks = self._prep_blocks(blocks, 0)
            n_blocks = self._stack_len(blocks)
        else:
            blocks = tuple(self._prep_blocks(b, i)
                           for i, b in enumerate(blocks))
            n_blocks = self._stack_len(blocks[0])
        sums, counts = self.run_fn(n_blocks)(blocks)
        shaped = counts[(...,) + (None,) * (sums.ndim - counts.ndim)]
        out = sums / jnp.maximum(shaped, 1)
        if bool(getattr(self.reduction, "_masked", False)):
            # fully-flagged cells: NaN, matching the eager node (see
            # integration.py Integrate._read_frame)
            out = jnp.where(shaped > 0, out, jnp.nan)
        return out, counts

    def _prep_blocks(self, blocks, i):
        """Normalize one source's block stack (packed pytree or array)."""
        if self._decoders[i] is not None:
            return jax.tree.map(jnp.asarray, blocks)
        return jnp.asarray(blocks)

    @staticmethod
    def _stack_len(prepped):
        return jax.tree.leaves(prepped)[0].shape[0]

    def run_blocks(self, blocks):
        """Convenience: run the compiled graph over stacked source blocks
        (a tuple of stacks for multi-source graphs; packed sources take
        ``(carrier, mask)`` stacks from :meth:`read_source_blocks`)."""
        if len(self.sources) > 1:
            blocks = tuple(self._prep_blocks(b, i)
                           for i, b in enumerate(blocks))
            return self.run_fn(self._stack_len(blocks[0]))(blocks)
        blocks = self._prep_blocks(blocks, 0)
        return self.run_fn(self._stack_len(blocks))(blocks)

    def read_source_blocks(self, n_blocks, offset=0):
        """Read ``n_blocks`` blocks from the graph's source stream(s),
        stacked for :meth:`run_blocks` (a tuple for multi-source).

        Packed sources (``packed=True``) come back as ``(carrier, mask)``
        stacks of raw payload carriers — no host decode happens here.
        """
        B = self.block_samples
        stacks = []
        for i, (src, extra) in enumerate(zip(self.sources,
                                             self.source_offsets)):
            if self._decoders[i] is not None:
                packs = [src.read_packed(extra + offset + k * B, B)
                         for k in range(n_blocks)]
                stacks.append(jax.tree.map(
                    lambda *xs: jnp.stack(xs), *packs))
                continue
            src.seek(extra + offset)
            stacks.append(jnp.stack(
                [jnp.asarray(src.read(B)) for _ in range(n_blocks)]))
        return tuple(stacks) if len(stacks) > 1 else stacks[0]


class _CombineStage:
    __slots__ = ("node", "k")

    def __init__(self, node, k):
        self.node = node
        self.k = k


def _fold_like(red):
    return isinstance(red, Fold)


def _pulse_like(red):
    from ..integration import PulseStack
    return isinstance(red, PulseStack)
