"""Latent dataset + prefetching loader for the distillation trainer.

TPU-native rebuild of the data path the reference trainer rides
(distill_with_cfg_sch_5s_exp0.py:469-492: fastvideo ``LatentDataset`` over
a JSON index of precomputed VAE latents + text embeddings,
``LengthGroupedSampler`` so every batch has a uniform latent length, and a
torch DataLoader). Here:

* ``LatentDataset`` reads a JSON index (list of ``{"latent": path,
  "context": path?}`` entries, paths relative to the index file); each
  sample is an .npz holding ``latents [C, F, h, w]`` (and optionally
  ``context [L, D]`` inline when no separate context file is given).
* ``length_grouped_batches`` is the sampler: shuffles, then groups
  indices by temporal length so each batch stacks to ONE static shape —
  under jit a ragged batch is not merely slow (torch's penalty), it is a
  recompile per shape, so uniform-length batching is load-bearing here.
* ``prefetch_to_device`` is the loader: a background host thread stages
  the next batches (np.stack + optional trim to ``num_latent_t`` frames)
  while the step runs, and ``jax.device_put`` lands them on the mesh
  sharding — overlap of host IO with TPU compute replaces torch's
  worker-process DataLoader.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import jax
import numpy as np


class LatentDataset:
    """JSON-indexed precomputed latents (+ text embeddings).

    Index file: ``[{"latent": "a.npz"}, {"latent": "b.npz",
    "context": "b_ctx.npz"}, ...]`` with paths relative to the index."""

    def __init__(self, index_path: str, num_latent_t: int = -1):
        self.root = os.path.dirname(os.path.abspath(index_path))
        with open(index_path) as f:
            self.entries: List[Dict[str, str]] = json.load(f)
        self.num_latent_t = num_latent_t
        # temporal lengths for the sampler, read from headers lazily once
        self._lengths: Optional[List[int]] = None

    def __len__(self) -> int:
        return len(self.entries)

    def _path(self, rel: str) -> str:
        return rel if os.path.isabs(rel) else os.path.join(self.root, rel)

    def lengths(self) -> List[int]:
        """Per-sample latent frame count F (post num_latent_t trim)."""
        if self._lengths is None:
            out = []
            for e in self.entries:
                with np.load(self._path(e["latent"])) as z:
                    f = int(z["latents"].shape[1])
                out.append(f if self.num_latent_t < 0
                           else min(f, self.num_latent_t))
            self._lengths = out
        return self._lengths

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        e = self.entries[i]
        with np.load(self._path(e["latent"])) as z:
            lat = np.asarray(z["latents"], np.float32)
            ctx = np.asarray(z["context"], np.float32) if "context" in z.files else None
        if "context" in e:
            with np.load(self._path(e["context"])) as z:
                ctx = np.asarray(z[z.files[0]], np.float32)
        if self.num_latent_t >= 0:
            lat = lat[:, : self.num_latent_t]
        out = {"latents": lat}
        if ctx is not None:
            out["context"] = ctx
        return out


def length_grouped_batches(
    lengths: Sequence[int], batch_size: int, seed: int = 0
) -> List[List[int]]:
    """Shuffled batches of indices with uniform latent length per batch
    (ref LengthGroupedSampler): one static shape per batch, zero ragged
    stacking and zero jit recompiles across batches of the same length."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(lengths))
    by_len: Dict[int, List[int]] = {}
    for i in order:
        by_len.setdefault(int(lengths[int(i)]), []).append(int(i))
    batches = []
    for group in by_len.values():
        for j in range(0, len(group) - batch_size + 1, batch_size):
            batches.append(group[j : j + batch_size])
    rng.shuffle(batches)
    return batches


def prefetch_to_device(
    dataset: LatentDataset,
    batches: Sequence[Sequence[int]],
    prefetch: int = 2,
    sharding: Optional[Any] = None,
) -> Iterator[Dict[str, jax.Array]]:
    """Yield device-resident stacked batches; a host thread stages up to
    ``prefetch`` batches ahead so IO overlaps the running TPU step."""
    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
    _END = object()

    def producer():
        # a raised exception (missing/corrupt .npz) must surface in the
        # consumer — swallowing it would silently truncate the epoch
        try:
            for idxs in batches:
                samples = [dataset[i] for i in idxs]
                batch = {
                    k: np.stack([s[k] for s in samples])
                    for k in samples[0]
                }
                q.put(batch)
        except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
            q.put(("__error__", exc))
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
            raise item[1]
        if sharding is not None:
            yield {k: jax.device_put(v, sharding) for k, v in item.items()}
        else:
            yield {k: jax.device_put(v) for k, v in item.items()}
