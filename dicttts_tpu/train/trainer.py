"""Max-updates trainer: jitted SPMD train step, periodic validation,
checkpoint rotate/best/resume, TB logging.

Capability parity with the reference Trainer
(/root/reference/utils/trainer.py:218-268,410-449 and tasks/base_task.py),
re-designed for JAX:

- the per-batch work is ONE jitted pure function `train_step(state, batch,
  rng) -> (state, metrics)` produced by the task — multi-optimizer GAN
  stepping, grad clipping and schedules live inside it, compiled once;
- data parallelism is a 1-D mesh with batch-axis NamedSharding; XLA inserts
  the gradient all-reduce (replaces DDP/NCCL, SURVEY.md §2.3);
- epoch-less `while True` loop bounded by max_updates, sanity validation
  before training, validation every val_check_interval, rank-0-gated side
  effects (`jax.process_index() == 0`), newest-checkpoint auto-resume,
  atomic rotated checkpoints and best-by-monitored-metric tracking;
- NaN guard: a non-finite total loss skips the update inside the jitted
  step (the reference's print_nan_grads/NaN-skip, trainer.py:320-327).
"""

from __future__ import annotations

import logging
import os
import threading
import time
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dicttts_tpu.parallel.mesh import (
    make_mesh,
    pad_batch_to_devices,
    replicate_state,
    shard_batch,
    shard_stacked_batches,
)
from dicttts_tpu.utils.checkpoint import (
    get_last_checkpoint,
    read_extras,
    restore_checkpoint,
    save_checkpoint,
)
from dicttts_tpu.utils.prefetch import prefetch_iterator

log = logging.getLogger("dicttts_tpu.trainer")


class Trainer:
    def __init__(
        self,
        work_dir: str,
        max_updates: int = 1000,
        val_check_interval: int = 2000,
        num_sanity_val_steps: int = 5,
        num_ckpt_keep: int = 3,
        tb_log_interval: int = 100,
        eval_max_batches: int = -1,
        monitor_key: str = "total_loss",
        monitor_mode: str = "min",
        seed: int = 1234,
        mesh=None,
        save_best: bool = True,
        steps_per_dispatch: int = 1,
        valid_infer_interval: Optional[int] = None,
        final_eval: bool = True,
    ):
        self.work_dir = work_dir
        self.max_updates = max_updates
        self.val_check_interval = val_check_interval
        self.num_sanity_val_steps = num_sanity_val_steps
        self.num_ckpt_keep = num_ckpt_keep
        self.tb_log_interval = tb_log_interval
        self.eval_max_batches = eval_max_batches
        self.monitor_key = monitor_key
        self.monitor_mode = monitor_mode
        self.seed = seed
        self.mesh = mesh or make_mesh()
        self.save_best = save_best
        # chain K optimizer steps inside ONE jitted dispatch (lax.scan over
        # stacked same-shape batches): removes K-1 host round-trips per
        # dispatch — measured 46s -> 46ms per step through this sandbox's
        # relay, and still saves sync overhead on real TPU VMs
        self.steps_per_dispatch = max(int(steps_per_dispatch), 1)
        # audio/figure artifact logging is FAR costlier than scalar
        # validation (an infer-mode dispatch + vocoder + matplotlib —
        # reference separates valid_infer_interval from val_check_interval
        # for the same reason, egs/egs_bases/tts/base.yaml): gate it on its
        # own interval, defaulting to every validation
        self.valid_infer_interval = valid_infer_interval or val_check_interval
        # bench/e2e harnesses skip the final evaluate+save (it costs a val
        # graph compile they never read)
        self.final_eval = final_eval
        self.global_step = 0
        self.best_val = np.inf if monitor_mode == "min" else -np.inf
        self._writer = None
        self._save_thread: Optional[threading.Thread] = None

    # -- logging ----------------------------------------------------------
    @property
    def is_chief(self) -> bool:
        return jax.process_index() == 0

    def _get_writer(self):
        if self._writer is None and self.is_chief and self.work_dir:
            try:
                from tensorboardX import SummaryWriter

                os.makedirs(self.work_dir, exist_ok=True)
                self._writer = SummaryWriter(logdir=os.path.join(self.work_dir, "tb"))
            except Exception:  # tensorboard optional
                self._writer = False
        return self._writer or None

    def log_metrics(self, metrics: dict, prefix: str):
        writer = self._get_writer()
        if writer:
            for k, v in metrics.items():
                writer.add_scalar(f"{prefix}/{k}", float(v), self.global_step)

    # -- main loops ---------------------------------------------------------
    def fit(self, task) -> Any:
        """Train `task` to max_updates. Returns the final state."""
        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng = jax.random.split(rng)
        state = task.build_state(init_rng)

        # resume from the newest checkpoint if present
        last = get_last_checkpoint(self.work_dir) if self.work_dir else None
        if last:
            consts = {k: v for k, v in state.items() if k.startswith("_const_")}
            self.global_step, restored = restore_checkpoint(last, _strip_consts(state))
            state = {**restored, **consts}
            best = read_extras(last).get("best_val")
            if best is not None:
                self.best_val = float(best)
            log.info("resumed from %s @ step %d (best_val=%s)", last, self.global_step, best)
        state = replicate_state(state, self.mesh)

        k = self.steps_per_dispatch
        # per-step rngs derive INSIDE the jit from (base key, global step):
        # the host issues zero jax.random dispatches per group (each tiny op
        # through this environment's relay costs a fixed issuance fee —
        # CLAUDE.md), and the stream is a pure function of the step, so a
        # kill+resume continues the exact rng sequence of an uninterrupted
        # run. Same reason the scan's last-step metrics slice lives in-jit:
        # a host-side tree.map(x[-1]) would issue one device op per metric.
        train_base_rng = jax.random.PRNGKey(self.seed + 1)
        # the per-group step index is read from the state's own 'step'
        # counter when the task tracks one (it always equals global_step at
        # dispatch time, including across resume): the dispatch then takes
        # ZERO fresh host scalars — a host-side step_idx argument costs an
        # extra host->device put on every group through this environment's
        # relay. Tasks without a 'step' counter fall back to the host arg.
        state_has_step = isinstance(state, dict) and "step" in state

        def _group_key(state, rng, step_idx):
            idx = state["step"] if state_has_step else step_idx
            return jax.random.fold_in(rng, idx)

        def single_step_fn(state, batch, rng, step_idx):
            return task.train_step(state, batch, _group_key(state, rng, step_idx))

        def multi_step_fn(state, batches, rng, step_idx):
            n = jax.tree.leaves(batches)[0].shape[0]
            rngs = jax.random.split(_group_key(state, rng, step_idx), n)

            def body(st, inp):
                b, r = inp
                return task.train_step(st, b, r)

            state, metrics = jax.lax.scan(body, state, (batches, rngs))
            return state, jax.tree.map(lambda x: x[-1], metrics)

        # step_idx is static when unused (state-derived step): the caller
        # then always passes 0, so there is exactly one compile and zero
        # per-group host scalar transfers
        static_step = (3,) if state_has_step else ()
        train_step = jax.jit(single_step_fn, donate_argnums=(0,), static_argnums=static_step)
        multi_step = jax.jit(multi_step_fn, donate_argnums=(0,), static_argnums=static_step)
        val_step = jax.jit(task.val_step)

        # sanity validation (crash early on a broken val path)
        if self.num_sanity_val_steps > 0 and self.global_step == 0:
            self._evaluate(task, state, val_step, rng, max_batches=self.num_sanity_val_steps, sanity=True)

        # GRAFT_TRACE_GROUPS=1: per-group host-side cost breakdown (batch
        # wait / pad+stack / device_put / dispatch issuance) printed at loop
        # exit — how the steady-state step time was attributed to collate vs
        # transfer vs dispatch (perf work, not a user-facing feature)
        trace = os.environ.get("GRAFT_TRACE_GROUPS") == "1"
        tacc = {"wait": 0.0, "stack": [], "put": [], "dispatch": []}

        def _run_group(state, group):
            """Dispatch a list of same-shape batches as one scanned jit call
            (or a single step when the group has one batch). Rng derives
            in-jit from the pre-group global step (unique per group — groups
            advance the step by len(group) >= 1)."""
            step_idx = 0 if state_has_step else np.int32(self.global_step)
            t0 = time.perf_counter()
            if len(group) == 1:
                b = pad_batch_to_devices(group[0], self.mesh.size)
                t1 = time.perf_counter()
                b = shard_batch(b, self.mesh)
                t2 = time.perf_counter()
                state, metrics = train_step(state, b, train_base_rng, step_idx)
            else:
                padded = [pad_batch_to_devices(b, self.mesh.size) for b in group]
                stacked = {key: np.stack([p[key] for p in padded]) for key in group[0]}
                t1 = time.perf_counter()
                stacked = shard_stacked_batches(stacked, self.mesh)
                t2 = time.perf_counter()
                state, metrics = multi_step(state, stacked, train_base_rng, step_idx)
            if trace:
                t3 = time.perf_counter()
                tacc["stack"].append(t1 - t0)
                tacc["put"].append(t2 - t1)
                tacc["dispatch"].append(t3 - t2)
            return state, metrics

        # throughput accounting: the first dispatch absorbs tracing, the
        # compile (or compile-cache load) and the initial transfer, so the
        # clock restarts after it with an explicit host-pull sync (this
        # environment's block_until_ready returns early — CLAUDE.md); the
        # loop-exit sync charges the remaining device queue, making
        # `steady_per_step_s` an honest pipelined steps/s over ONE run —
        # no cross-run differencing needed (bench.py).
        t_start, steps_done = time.time(), 0
        t_excluded = 0.0  # validation/checkpoint/artifact wall time
        synced_once = False
        self.steady_per_step_s = None
        group: list = []
        while self.global_step < self.max_updates:
            # depth is capped: host-bank dict batches can run ~100 MB each
            # (keys/values [B, Tw, L_k, 768]), so a 2*k queue at k=16 would
            # pin gigabytes; 8 ahead is plenty to keep the producer ahead of
            # the ~5 ms/batch collate vs ~35 ms/group dispatch cadence
            for batch in _timed_iter(prefetch_iterator(task.train_batches(), depth=min(2 * k, 8)), tacc):
                if self.global_step >= self.max_updates:
                    break
                batch.pop("_meta", None)
                group.append(batch)
                same_shape = len(group) < 2 or all(
                    np.shape(group[-1][key]) == np.shape(group[0][key]) for key in group[0]
                )
                boundary = (
                    len(group) >= k
                    or not same_shape
                    or (self.global_step + len(group)) % self.val_check_interval == 0
                    or (self.global_step + len(group)) >= self.max_updates
                )
                if not boundary:
                    continue
                if not same_shape:  # run the matching prefix, re-queue the odd one
                    odd = group.pop()
                    requeue = [odd]
                else:
                    requeue = []
                n_ran = len(group)
                state, metrics = _run_group(state, group)
                self.global_step += n_ran
                steps_done += n_ran
                group = requeue
                if not synced_once:
                    jax.device_get(jax.tree.leaves(metrics)[0])  # sync
                    synced_once = True
                    t_start, steps_done = time.time(), 0
                # log once per interval (group steps may jump past the mark)
                if self.global_step % self.tb_log_interval < n_ran:
                    metrics = jax.device_get(metrics)
                    # same exclusion as steady_per_step_s so the live log and
                    # the final number agree
                    sps = steps_done / max(time.time() - t_start - t_excluded, 1e-9)
                    metrics["steps_per_sec"] = sps
                    self.log_metrics(metrics, "tr")
                    log.info(
                        "step %d | %s | %.2f it/s",
                        self.global_step,
                        " ".join(f"{name}={float(v):.4f}" for name, v in metrics.items()),
                        sps,
                    )
                # validate once per interval (also when a group jumps past it)
                if self.global_step % self.val_check_interval < n_ran:
                    # validation/ckpt time is NOT train throughput: drain the
                    # step queue first, then exclude this block's wall time
                    # from the steady-state clock
                    jax.device_get(jax.tree.leaves(metrics)[0])
                    t_val = time.time()
                    val_metrics = self._evaluate(task, state, val_step, rng)
                    t_ev = time.time()
                    self._save(state, val_metrics)
                    t_sv = time.time()
                    if self.global_step % self.valid_infer_interval < n_ran:
                        self._log_artifacts(task, state, rng)
                    t_excluded += time.time() - t_val
                    log.info(
                        "val block @ %d: eval %.1fs save %.1fs artifacts %.1fs",
                        self.global_step, t_ev - t_val, t_sv - t_ev, time.time() - t_sv,
                    )
        if synced_once and steps_done > 0:
            jax.device_get(jax.tree.leaves(metrics)[0])  # drain the queue
            self.steady_per_step_s = (time.time() - t_start - t_excluded) / steps_done
        if trace and tacc["dispatch"]:
            g = len(tacc["dispatch"])
            med = lambda xs: 1e3 * float(np.median(xs[1:] or xs))  # skip 1st (compile)
            print(
                f"[trace] groups={g} per-group ms (median, 1st group excluded): "
                f"wait={1e3 * tacc['wait'] / g:.1f} stack={med(tacc['stack']):.1f} "
                f"put={med(tacc['put']):.1f} dispatch={med(tacc['dispatch']):.1f} "
                f"first_dispatch={1e3 * tacc['dispatch'][0]:.0f}",
                flush=True,
            )
        # final checkpoint
        if self.final_eval:
            self._save(state, self._evaluate(task, state, val_step, rng))
        self._join_pending_save()
        return state

    def test(self, task, state=None) -> list:
        """Run the task's test loop (inference); returns per-batch outputs."""
        if state is None:
            rng = jax.random.PRNGKey(self.seed)
            state = task.build_state(rng)
            last = get_last_checkpoint(self.work_dir)
            if last:
                consts = {k: v for k, v in state.items() if k.startswith("_const_")}
                self.global_step, restored = restore_checkpoint(last, _strip_consts(state))
                state = {**restored, **consts}
        state = replicate_state(state, self.mesh)
        infer_step = jax.jit(task.test_step)
        rng = jax.random.PRNGKey(self.seed + 1)
        outputs = []
        for i, batch in enumerate(task.test_batches()):
            rng, step_rng = jax.random.split(rng)
            meta = batch.pop("_meta", None)  # host-side strings stay on host
            batch_d = shard_batch(pad_batch_to_devices(batch, self.mesh.size), self.mesh)
            out = jax.device_get(infer_step(state, batch_d, step_rng))
            if meta is not None:
                batch["_meta"] = meta
            outputs.append(task.after_test_step(i, batch, out) if hasattr(task, "after_test_step") else out)
        if hasattr(task, "test_end"):
            task.test_end(outputs)
        return outputs

    # -- internals ----------------------------------------------------------
    def _evaluate(self, task, state, val_step, rng, max_batches: Optional[int] = None, sanity: bool = False) -> dict:
        max_batches = max_batches if max_batches is not None else self.eval_max_batches
        results: list = []  # (device metric tree, true sentence count)
        for i, batch in enumerate(task.val_batches()):
            if 0 < (max_batches or 0) <= i:
                break
            rng, step_rng = jax.random.split(rng)
            batch.pop("_meta", None)
            # size-weighted aggregation (reference AvgrageMeter semantics,
            # tasks/base_task.py:260-292): with token-budget batching the
            # batches are unequal — weight each batch's per-sentence means by
            # its TRUE sentence count (pre-padding) so the val mean is
            # invariant to how the data was partitioned into batches
            n_sent = _batch_sentences(batch)
            batch = shard_batch(pad_batch_to_devices(batch, self.mesh.size), self.mesh)
            # no per-batch host sync: metric trees stay on device so the val
            # dispatches pipeline; ONE device_get drains them all (each
            # per-batch pull costs a full host round-trip through the relay)
            results.append((val_step(state, batch, step_rng), n_sent))
        sums: dict = {}
        count = 0
        for metrics, n_sent in zip(jax.device_get([m for m, _ in results]),
                                    [n for _, n in results]):
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v) * n_sent
            count += n_sent
        means = {k: v / max(count, 1) for k, v in sums.items()}
        if not sanity:
            if self.monitor_key in means:
                total = means[self.monitor_key]
            else:
                # monitor fallback must not mix non-loss diagnostics (e.g.
                # attention focus rates) into the best-checkpoint decision:
                # restrict to loss-named metrics, whole-sum only as a last
                # resort for tasks that report nothing loss-like
                loss_means = {k: v for k, v in means.items() if "loss" in k or k == "kl"}
                total = sum(loss_means.values()) if loss_means else sum(means.values())
            means.setdefault("total_loss", total)
            self.log_metrics(means, "val")
            log.info("validation @ %d: %s", self.global_step, means)
        return means

    def _log_artifacts(self, task, state, rng):
        """Audio/figure validation logging (reference valid_infer_interval
        behavior, tasks/tts/dict_tts.py:127-177): tasks may implement
        `validation_artifacts(state, batch, rng) -> {audio: {name: (wav,
        sr)}, figures: {name: Figure}}` on the first val batch."""
        writer = self._get_writer()
        if writer is None or not hasattr(task, "validation_artifacts"):
            return
        try:
            batch = next(iter(task.val_batches()))
            batch.pop("_meta", None)
            batch = shard_batch(pad_batch_to_devices(batch, self.mesh.size), self.mesh)
            arts = task.validation_artifacts(state, batch, rng)
            for name, (wav, sr) in arts.get("audio", {}).items():
                writer.add_audio(name, np.asarray(wav)[:, None], self.global_step, sample_rate=sr)
            for name, fig in arts.get("figures", {}).items():
                writer.add_figure(name, fig, self.global_step)
        except Exception as e:  # artifacts must never kill training
            log.warning("validation artifact logging failed: %s", e)

    def _save(self, state, val_metrics: dict):
        if not (self.is_chief and self.work_dir):
            return
        monitored = val_metrics.get(self.monitor_key, val_metrics.get("total_loss", np.inf))
        better = monitored < self.best_val if self.monitor_mode == "min" else monitored > self.best_val
        if better:
            self.best_val = monitored
        # '_const_' entries (device dict bank, ...) are derived data: exclude
        # them BEFORE device_get so checkpoints stay small and no multi-GB
        # device->host pull happens per save
        state = _strip_consts(state)
        # train_step donates the state buffers, so they are invalid once the
        # next dispatch runs — but pulling them to host HERE costs seconds
        # through a slow link (~250 MB of params+opt moments). Instead take a
        # device-side snapshot (one jitted buffer copy, microseconds of HBM
        # traffic) and move the device->host pull, msgpack serialize and disk
        # write ALL to a worker thread: training dispatches the next group
        # while the transfer streams out. lax.copy is bit-exact (no -0.0
        # flips), so kill+resume equality is preserved. Writes are serialized
        # (join before start) so rotation stays ordered, and the
        # .part+replace protocol keeps a mid-write kill harmless.
        snapshot = _snapshot_tree(state)
        step_now = self.global_step
        self._join_pending_save()
        is_best = self.save_best and better
        best_val = float(self.best_val)
        keep = self.num_ckpt_keep
        work_dir = self.work_dir

        def _pull_and_write():
            save_checkpoint(
                work_dir, step_now, jax.device_get(snapshot),
                keep=keep, is_best=is_best, extra={"best_val": best_val},
            )

        self._save_thread = threading.Thread(target=_pull_and_write, daemon=True)
        self._save_thread.start()

    def _join_pending_save(self):
        if self._save_thread is not None:
            self._save_thread.join()
            self._save_thread = None


def _timed_iter(it, acc: dict):
    """Yield from `it`, accumulating consumer-side wait time into
    acc['wait'] (GRAFT_TRACE_GROUPS breakdown)."""
    it = iter(it)
    while True:
        t0 = time.perf_counter()
        try:
            item = next(it)
        except StopIteration:
            return
        acc["wait"] += time.perf_counter() - t0
        yield item


def _batch_sentences(batch: dict) -> int:
    """True sentence count of a host batch (leading dim of a batch-major
    array, preferring canonical keys so aux arrays can't mislead)."""
    for key in ("mels", "wavs", "word_tokens", "txt_tokens"):
        v = batch.get(key)
        if v is not None and np.ndim(v) >= 1:
            return int(np.shape(v)[0])
    for v in batch.values():
        if hasattr(v, "shape") and np.ndim(v) >= 1:
            return int(np.shape(v)[0])
    return 1


def _strip_consts(state):
    """Drop '_const_'-prefixed state entries (task-attached device constants
    like the dict bank) — not model state, never checkpointed."""
    if isinstance(state, dict):
        return {k: v for k, v in state.items() if not k.startswith("_const_")}
    return state


@jax.jit
def _snapshot_tree(tree):
    """Bit-exact device-side copy of every leaf, in ONE dispatch.

    Checkpointing needs buffers that survive the next train dispatch (which
    donates the live state); copying in HBM costs microseconds where the
    host pull costs seconds, so the pull can move off the training thread.
    `jnp.copy` (not `x + 0`) so -0.0 and NaN payloads round-trip exactly —
    kill+resume bit-equality is a tested property (scripts/soak.py)."""
    return jax.tree.map(jnp.copy, tree)


def repeat_batches(make_iter) -> Iterator:
    """Epoch-less stream: chain fresh iterators forever (reference
    `while True` epoch loop, utils/trainer.py:230)."""
    while True:
        yield from make_iter()
