"""Scan-driven compiled execution of lazy stream chains.

The lazy Stream API (base.py) drives each node's frame from the host —
right for interactive use, wrong for production throughput (every stage is
a separate dispatch).  :class:`CompiledPipeline` walks a chain of tasks and
compiles the whole thing into a single per-block step function, then
drives it with ``jax.lax.scan`` over time blocks, with overlap-save pads
carried as scan state instead of re-read — the declarative
"pipeline graph → scan over blocks" design of SURVEY.md §7.

Supported chains: linear sequences of ``TaskBase`` subclasses whose
``task`` is a pure device function (Channelize, Dechannelize, Square,
Power, Real2Complex, Task, SetAttribute, Convolve, Disperse/Dedisperse,
ShiftAndResample, ShiftSamples, PFBs...).  Integrate/Fold use host
bookkeeping and are applied downstream of the compiled part.

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

import numpy as np

import jax
import jax.numpy as jnp

from ..base import BaseTaskBase, PaddedTaskBase, SetAttribute, TaskBase

__all__ = ["CompiledPipeline"]


class _Stage:
    __slots__ = ("node", "padded", "pad", "in_block", "out_block",
                 "in_sample_shape", "in_dtype")

    def __init__(self, node, padded, pad, in_block, out_block):
        self.node = node
        self.padded = padded
        self.pad = pad
        self.in_block = in_block
        self.out_block = out_block
        self.in_sample_shape = node.ih.sample_shape
        self.in_dtype = node.ih.dtype


class CompiledPipeline:
    """Compile a lazy task chain into one jitted block step.

    Parameters
    ----------
    tail : stream
        The chain's last node; its ``ih`` ancestry is walked up to the
        source.  The source itself is *not* compiled — blocks of source
        samples are the step input.
    """

    def __init__(self, tail):
        nodes = []
        node = tail
        while isinstance(node, BaseTaskBase):
            nodes.append(node)
            node = node.ih
        if not nodes:
            raise ValueError("tail has no task nodes to compile")
        self.source = node
        nodes.reverse()

        # Determine the block size at the top: padded stages process whole
        # windows (their cached responses are window-sized), so the block
        # arriving at a padded stage must equal its samples_per_frame.
        from fractions import Fraction
        stages = []
        scale = Fraction(1)   # top block -> block at the current stage
        top_block = None
        granularity = 1       # top block must be a multiple of this

        for n in nodes:
            if isinstance(n, SetAttribute):
                stages.append(_Stage(n, False, 0, None, None))
                continue
            if isinstance(n, PaddedTaskBase):
                need = Fraction(n.samples_per_frame) / scale
                if need.denominator != 1:
                    raise ValueError("incompatible frame sizes along the "
                                     "chain")
                need = int(need)
                if top_block is None:
                    top_block = need
                elif top_block != need:
                    raise ValueError(
                        f"padded stages disagree on block size: "
                        f"{top_block} vs {need} source samples; construct "
                        f"them with matching samples_per_frame")
                stages.append(_Stage(n, True, n.pad_start + n.pad_end,
                                     n.samples_per_frame,
                                     n.samples_per_frame))
                continue
            if isinstance(n, TaskBase):
                ratio = Fraction(n.samples_per_frame,
                                 n._ih_samples_per_frame)
                stages.append(_Stage(n, False, 0, ratio.denominator,
                                     ratio.numerator))
                # the block at this stage must hold whole groups of
                # `denominator` input samples
                need_top = (Fraction(ratio.denominator) / scale)
                granularity = int(np.lcm(granularity,
                                         max(need_top.numerator, 1)))
                scale *= ratio
                continue
            raise ValueError(f"cannot compile node {type(n).__name__}")
        if top_block is None:
            top_block = granularity
        elif top_block % granularity:
            raise ValueError(
                f"block of {top_block} source samples does not hold whole "
                f"groups for all rate-changing stages (need a multiple of "
                f"{granularity})")
        self.stages = stages
        self.block_samples = top_block
        self._tail = tail

        # Streaming latency: each padded stage delays its output by `pad`
        # samples at its own rate; rate changes scale it.  Outputs beyond
        # `warmup` tail samples equal the eager chain's output at
        # index - delay.
        delay = Fraction(0)
        for st in stages:
            if st.padded:
                delay += st.pad
            elif st.in_block:
                delay *= Fraction(st.out_block, st.in_block)
        self.delay = delay  # exact, in tail samples (may be fractional if
        #                     a rate change follows a padded stage)
        self.warmup = int(np.ceil(delay))

    # -- the compiled step ----------------------------------------------
    def init_carry(self):
        carries = []
        for st in self.stages:
            if st.padded:
                carries.append(jnp.zeros(
                    (st.pad,) + st.in_sample_shape,
                    st.in_dtype))
        return tuple(carries)

    def _prepare_caches(self):
        """Materialize lazy device caches eagerly: built inside a traced
        step they would capture tracers (chirps, response FTs, gains)."""
        for st in self.stages:
            n = st.node
            if getattr(n, "_chirp_cache", 1) is None:
                n._chirp_cache = n._chirp()
            if getattr(n, "_ft_response_cache", 1) is None:
                n._ft_response_cache = n._ft_response()
            if getattr(n, "_gain_cache", 1) is None and \
                    hasattr(n, "_make_gain"):
                n._gain_cache = n._make_gain(
                    n._padded_samples_per_frame // n._n)
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

    def step_fn(self):
        """(carry, block) -> (carry, out_block), jittable."""
        self._prepare_caches()
        stages = self.stages

        def step(carry, x):
            new_carry = []
            ci = 0
            for st in stages:
                if isinstance(st.node, SetAttribute):
                    continue
                if st.padded:
                    window = jnp.concatenate([carry[ci], x], axis=0)
                    new_carry.append(window[-st.pad:] if st.pad else
                                     window[:0])
                    ci += 1
                    x = st.node.task(window)
                else:
                    x = st.node.task(x)
            return tuple(new_carry), x

        return step

    def run_fn(self, n_blocks):
        """Jitted scan over ``n_blocks`` source blocks.

        Returns ``run(blocks) -> out`` where ``blocks`` has shape
        ``(n_blocks, block_samples) + source.sample_shape`` and ``out``
        the concatenated tail-rate output.
        """
        step = self.step_fn()

        @jax.jit
        def run(blocks):
            carry = self.init_carry()
            carry, ys = jax.lax.scan(step, carry, blocks)
            return ys.reshape((-1,) + ys.shape[2:])

        return run

    def run_blocks(self, blocks):
        """Convenience: run the compiled chain over stacked source blocks."""
        return self.run_fn(len(blocks))(jnp.asarray(blocks))

    def read_source_blocks(self, n_blocks, offset=0):
        """Read ``n_blocks`` blocks from the chain's own source stream
        (e.g. a VDIF/HDF5 reader), stacked for :meth:`run_blocks`."""
        src = self.source
        src.seek(offset)
        return jnp.stack([jnp.asarray(src.read(self.block_samples))
                          for _ in range(n_blocks)])
