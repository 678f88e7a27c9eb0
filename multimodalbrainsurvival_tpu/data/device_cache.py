"""Device-resident patch cache: decode once, gather bags on-device.

Motivation (docs/DESIGN.md item 11): the training loop ships
``batch × bag × 224² × 3`` uint8 per step — 19.3 MB at the reference default
config — which binds the real loop to host→device bandwidth (measured
~180 bags/s through this container's ~28 MB/s tunnel vs 4,997 bags/s for
the compiled step). The reference default caps patches per slide at 100
(``config_ffpe_train.json:24-25``), so whole cohorts fit in HBM:

    783 WSIs × 100 patches × 224²×3 uint8  ≈ 11 GB   (v5e: 16 GB)

``DeviceCachedPatchBags`` wraps any ``PatchBagDataset``-family dataset:
every patch is decoded ONCE (same threaded/native decode path), uploaded
ONCE as a flat ``(N, H, W, 3)`` uint8 device array, and each training step
receives its bags via an on-device gather driven by a few KB of int32
indices — per-epoch traffic drops from bytes-of-dataset to
bytes-of-indices. Bag semantics (per-slide patch lists, bag chunking,
remainder handling, per-epoch in-slide ``shuffle()`` —
``1_HistoPathology/models.py:258-295``) are inherited from the wrapped
dataset's own index, so batches are content-identical to the base loader
(tested in ``tests/test_device_cache.py``).

Opt-in via ``cache_patches_on_device: true`` in the histo/joint train
configs. Falls back to the base dataset (with a warning) when the cohort
exceeds ``max_bytes``.

Mesh-sharded mode (pass ``mesh=``): the cache rows are BLOCK-SHARDED over
every device of the mesh — the HBM budget becomes n_devices × per-chip —
and batch assembly runs as a ``shard_map``: each device gathers the rows it
owns, the partial bags are combined by ``psum``/``psum_scatter`` over ICI,
and the batch lands already dp-sharded on its sample axis (bag mp-sharded
too under ``shard_bag``), exactly the shardings the sharded train step
consumes. Per-step traffic is ONE int32 ``sel`` upload; pixel bytes move
only over ICI.

Real-tiling-scale capacity, MEASURED on a v5e-1 (round 5,
``benchmarks/full_scale_train.py``): a 32-slide × 2,000-patch cohort
(64,000 patches = 9.0 GiB — the reference's own tiling density,
``1_WSI2Patches.py:157-159``) holds fully cached while the flagship MIL
fine-tune (bf16 ResNet-50, freeze-2, ``remat`` + ``accumulate_steps: 4``,
batch 16 × bag 64) trains from it at **103.7 bags/s (6,637 patches/s),
peak 10.7 GiB** (9.0 cache + 1.7 step program). 40 × 2,000 (11.2 GiB)
exceeds the 16 GiB chip once the step's workspace lands — the single-chip
ceiling at this shape is ~35 slides; beyond that the mesh-sharded mode
scales the budget by the device count (a v5e-8 holds ~280 such slides;
the full 783-WSI cohort at 2,000 patches ≈ 220 GB wants a 16-chip mesh).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def cache_bytes(base) -> int:
    n = sum(e["n_images"] for e in base.data.values())
    return n * base.img_size * base.img_size * 3


def _n_shards(mesh) -> int:
    return 1 if mesh is None else int(mesh.devices.size)


def cache_fits(base, max_bytes: int, mesh=None) -> bool:
    return cache_bytes(base) <= max_bytes * _n_shards(mesh)


def maybe_cache_on_device(base, enabled: bool, *, max_bytes: int = 12 << 30,
                          mesh=None, shard_bag: bool = False):
    """Config-driven constructor: wrap ``base`` when enabled and it fits.

    ``max_bytes`` is the PER-DEVICE budget; with a mesh the cohort may span
    ``n_devices × max_bytes`` (rows block-sharded across all devices).
    """
    if not enabled:
        return base
    if not cache_fits(base, max_bytes, mesh):
        total = sum(e["n_images"] for e in base.data.values())
        print(
            f"cache_patches_on_device: cohort too large for HBM cache "
            f"({total} patches x {base.img_size}^2x3 > "
            f"{_n_shards(mesh)} device(s) x {max_bytes} bytes); "
            f"falling back to the host loader"
        )
        return base
    return DeviceCachedPatchBags(base, mesh=mesh, shard_bag=shard_bag)


def maybe_cache_datasets(datasets: dict, enabled: bool,
                         *, max_bytes: int = 12 << 30,
                         mesh=None, shard_bag: bool = False) -> dict:
    """Wrap a {split: dataset} dict with ONE shared HBM budget.

    All splits share the device memory, so the fit check must be on the
    aggregate, not per split. If everything fits, every split is cached
    (eval ships pixels once per epoch too); if only the train split fits,
    cache just that (it dominates per-epoch traffic); otherwise fall back
    to the host loader entirely, with a message either way. ``max_bytes``
    is per device; a mesh multiplies the budget by its device count.
    """
    if not enabled:
        return datasets

    def wrap(ds):
        return DeviceCachedPatchBags(ds, mesh=mesh, shard_bag=shard_bag)

    budget = max_bytes * _n_shards(mesh)
    total = sum(cache_bytes(ds) for ds in datasets.values())
    if total <= budget:
        return {k: wrap(v) for k, v in datasets.items()}
    train = datasets.get("train")
    if train is not None and cache_fits(train, max_bytes, mesh):
        print(
            "cache_patches_on_device: all splits together exceed the HBM "
            f"budget ({total} > {budget} bytes); caching only 'train'"
        )
        return {k: wrap(v) if k == "train" else v for k, v in datasets.items()}
    print(
        f"cache_patches_on_device: cohort too large for HBM cache "
        f"({total} > {budget} bytes); falling back to the host loader"
    )
    return datasets


class DeviceCachedPatchBags:
    def __init__(self, base, mesh=None, *, shard_bag: bool = False):
        import jax

        self.base = base
        self.bag_size = base.bag_size
        self.img_size = base.img_size
        self.mesh = mesh
        self.shard_bag = bool(shard_bag and mesh is not None)
        self._rng = np.random.default_rng(0)
        if jax.process_count() > 1:
            # the cache's shard_map assembly and its index uploads are
            # single-host machinery; under a multi-process runtime
            # (mesh: {"distributed": true}) use the host loader path, which
            # places batches per process via batch_device_put/host_to_global
            raise NotImplementedError(
                "cache_patches_on_device is a single-host optimization; "
                "multi-host runs must use the host loader (drop the "
                "cache_patches_on_device config key)"
            )
        if self.shard_bag and base.bag_size % mesh.shape.get("mp", 1):
            raise ValueError(
                f"shard_bag cache needs bag_size ({base.bag_size}) divisible "
                f"by the mesh's mp axis ({mesh.shape.get('mp', 1)})"
            )

        # decode every (capped) patch ONCE, through the base's own decode
        # paths, in each slide's current patch-list order; flat row i of a
        # slide corresponds to position i of that list at wrap time
        from multimodalbrainsurvival_tpu.data.patches import _decode_bag

        # one flat permutation array; self.ids[wsi] are contiguous VIEWS into
        # it (shuffle() permutes them in place), so batch assembly can gather
        # from _ids_flat with vectorized indexing
        n_total = sum(e["n_images"] for e in base.data.values())
        self._ids_flat = np.arange(n_total, dtype=np.int32)
        self.ids: dict[str, np.ndarray] = {}
        # Cache stored 3-D (rows, row_len/128, 128): the gather's cost is
        # purely a layout question. As a 4-D (N,H,W,3) table XLA relayouts
        # the ENTIRE cohort inside the gather program (3.0 ms/step
        # whole-cache u8 copy); as 2-D flat rows the tiled layout forces a
        # slow data-movement fusion (1.9 ms/step, ~20 GB/s); with each row a
        # tile-aligned (k, 128) plane the same gather runs at 641 GB/s =
        # 0.06 ms — near the HBM roofline (measured; docs/DESIGN.md item 15;
        # a pallas DMA row-gather kernel was built and measured 15% SLOWER,
        # so XLA keeps the job). Rows zero-pad up to a 128 multiple (pad
        # sliced off after the per-batch gather); slides decode straight
        # into the one padded host buffer so peak host memory is the cohort
        # plus a single slide, not 2-3 cohort copies.
        row = base.img_size * base.img_size * 3
        self._row_pad = (-row) % 128
        # mesh mode: rows are BLOCK-SHARDED over every device of the mesh
        # (row count padded up to a multiple of the device count), so the
        # aggregate HBM budget is n_devices x per-chip; device d of the
        # row-major (dp, mp) grid owns rows [d*rows_local, (d+1)*rows_local)
        n_shards = _n_shards(mesh)
        rows_total = -(-max(n_total, 1) // n_shards) * n_shards
        flat = np.zeros((rows_total, row + self._row_pad), np.uint8)
        start = 0
        for wsi, entry in base.data.items():
            n = entry["n_images"]
            items_all = entry["images"]
            if entry.get("packed_path"):
                import cv2

                shard = np.load(entry["packed_path"], mmap_mode="r")
                got = np.asarray(shard[np.asarray(items_all, np.intp)])
                if got.shape[1] != base.img_size:
                    resized = np.zeros(
                        (n, base.img_size, base.img_size, 3), np.uint8
                    )
                    for j, r in enumerate(got):
                        resized[j] = cv2.resize(
                            r, (base.img_size, base.img_size),
                            interpolation=cv2.INTER_LINEAR,
                        )
                    got = resized
            else:
                got = np.zeros((n, base.img_size, base.img_size, 3), np.uint8)
                _decode_bag(list(items_all), got, base.img_size, base.use_native)
            flat[start : start + n, :row] = got.reshape(n, -1)
            del got
            self.ids[wsi] = self._ids_flat[start : start + n]
            start += n
        flat3d = flat.reshape(flat.shape[0], (row + self._row_pad) // 128, 128)
        if mesh is None:
            self._cache = jax.device_put(flat3d)
            self._replicate = None
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._cache = jax.device_put(
                flat3d, NamedSharding(mesh, P(mesh.axis_names))
            )
            self._replicate = NamedSharding(mesh, P())
        del flat, flat3d  # no host copy of the pixels survives wrap time

        # Precomputed per-item tables so ``batches()`` is a few numpy gathers
        # instead of a Python loop over the batch (measured: that loop held
        # in-loop training ~45% under the compiled step's rate on one core).
        # Per-slide labels never change across epochs; only ``self.ids``
        # (the in-slide permutation) does.
        wsi_keys = list(base.data.keys())
        slot_of = {w: i for i, w in enumerate(wsi_keys)}
        self._wsi_names = [base.data[w]["WSI"] for w in wsi_keys]
        self._case_names = [
            str(base.data[w].get("case", base.data[w]["WSI"]))
            for w in wsi_keys
        ]
        label_dicts = [base._labels(base.data[w]) for w in wsi_keys]
        # union of label keys across ALL slides (not just the first): with
        # heterogeneous CSV rows the per-batch host assembly picks up whatever
        # each item carries, so a column missing from the first slide must not
        # be silently dropped from cached batches; absent entries default to 0
        self._scalar_keys = [
            k
            for k in dict.fromkeys(k for d in label_dicts for k in d)
            if k not in ("WSI", "case")
        ]
        self._scalars = {
            k: np.asarray([d.get(k, 0) for d in label_dicts])
            for k in self._scalar_keys
        }
        if any("rna_data" in e for e in base.data.values()):
            self._rna = np.asarray(
                [np.asarray(base.data[w]["rna_data"], np.float32)
                 for w in wsi_keys]
            )
        else:
            self._rna = None
        self._item_slot = np.asarray(
            [slot_of[w] for w, _ in base.index], np.int32
        )
        self._item_off = np.asarray([off for _, off in base.index], np.int32)
        self._item_len = np.minimum(
            self.bag_size,
            np.asarray(
                [base.data[w]["n_images"] for w, _ in base.index], np.int32
            ) - self._item_off,
        )
        self._wsi_base = np.asarray(
            np.cumsum([0] + [base.data[w]["n_images"] for w in wsi_keys[:-1]]),
            np.int64,
        )

        # Device-resident copies of every per-item/per-slide table, so each
        # step's batch is assembled ON DEVICE from a single (batch_size,)
        # int32 `sel` upload — one small H2D + one dispatch per step. The
        # earlier shape (host-built masks/scalars, one H2D per array) paid a
        # tunnel round-trip per ARRAY per step; every array the train step
        # consumes (pixels, masks, survival scalars, rna) now never exists on
        # the host after wrap time. Padded bag slots / padded sample rows are
        # zeroed via the masks so batches match the host loader's zero-filled
        # padding exactly (train-mode BN statistics see every patch, masked
        # or not); padded rows' scalar labels are zeroed by sample_mask.
        def _put(x):
            return jax.device_put(
                x, *(() if self._replicate is None else (self._replicate,))
            )

        self._dev_tables = {
            "item_slot": _put(self._item_slot),
            "item_off": _put(self._item_off),
            "item_len": _put(self._item_len),
            "wsi_base": _put(self._wsi_base.astype(np.int32)),
            "scalars": {k: _put(v) for k, v in self._scalars.items()},
            "rna": None if self._rna is None else _put(self._rna),
        }
        self._put = _put
        self._dev_ids = _put(self._ids_flat)
        self._ids_dirty = False
        n_rows = max(len(self._ids_flat), 1)

        import jax.numpy as jnp

        def _global_index(ids_flat, tables, sel, b):
            """(idx, slots, valid, sample_mask) of the FULL batch — the
            per-slide index math shared by both assembly modes."""
            lane = jnp.arange(self.bag_size, dtype=jnp.int32)[None, :]
            sample_mask = jnp.arange(sel.shape[0], dtype=jnp.int32) < b
            slots = tables["item_slot"][sel]
            valid = (lane < tables["item_len"][sel][:, None]) & sample_mask[
                :, None
            ]
            gidx = jnp.clip(
                tables["wsi_base"][slots][:, None]
                + tables["item_off"][sel][:, None]
                + lane,
                0,
                n_rows - 1,
            )
            return jnp.where(valid, ids_flat[gidx], 0), slots, valid, sample_mask

        row = self.img_size * self.img_size * 3

        def _scalar_columns(tables, slots, sample_mask):
            out = {}
            for k, col in tables["scalars"].items():
                out[k] = jnp.where(sample_mask, col[slots], 0)
            if tables["rna"] is not None:
                out["rna_data"] = tables["rna"][slots] * sample_mask[:, None]
            return out

        if mesh is None:

            def _assemble(cache, ids_flat, tables, sel, b):
                idx, slots, valid, sample_mask = _global_index(
                    ids_flat, tables, sel, b
                )
                bag = cache[idx] * valid[..., None, None].astype(cache.dtype)
                bag = bag.reshape(idx.shape + (-1,))[..., :row]
                out = {
                    "patch_bag": bag.reshape(
                        idx.shape + (self.img_size, self.img_size, 3)
                    ),
                    "bag_mask": valid,
                    "sample_mask": sample_mask,
                }
                out.update(_scalar_columns(tables, slots, sample_mask))
                return out

            self._assemble = jax.jit(_assemble)
        else:
            # shard_map assembly: each device gathers the cache rows IT owns
            # (rows are block-sharded over the row-major (dp, mp) grid), the
            # zero-masked partial bags are combined over ICI — psum_scatter
            # along the sample axis over dp (and along the bag axis over mp
            # under shard_bag; plain psum over mp otherwise) — and every
            # output lands already carrying the sharding the sharded train
            # step consumes (samples over dp, bag over mp). Exactly one
            # device contributes each element, so the sums never overflow
            # uint8. Per-step H2D is the int32 ``sel`` alone.
            from jax.sharding import PartitionSpec as P
            from jax.experimental.shard_map import shard_map

            dp = mesh.shape["dp"]
            mp = int(np.prod(
                [mesh.shape[a] for a in mesh.axis_names if a != "dp"]
            ))
            mp_axes = tuple(a for a in mesh.axis_names if a != "dp")
            rows_local = rows_total // n_shards
            shard_bag_ = self.shard_bag and mp > 1

            def _local(cache_blk, ids_flat, tables, sel, b):
                lax = jax.lax
                idx, slots, valid, sample_mask = _global_index(
                    ids_flat, tables, sel, b
                )
                shard = lax.axis_index("dp")
                for a in mp_axes:
                    shard = shard * mesh.shape[a] + lax.axis_index(a)
                lidx = idx - shard * rows_local
                owned = (lidx >= 0) & (lidx < rows_local)
                keep = (valid & owned)[..., None, None].astype(cache_blk.dtype)
                part = cache_blk[jnp.clip(lidx, 0, rows_local - 1)] * keep
                if shard_bag_:
                    for a in mp_axes:
                        part = lax.psum_scatter(
                            part, a, scatter_dimension=1, tiled=True
                        )
                elif mp > 1:
                    part = lax.psum(part, mp_axes)
                bag_u8 = lax.psum_scatter(
                    part, "dp", scatter_dimension=0, tiled=True
                )
                bs, bag_l = bag_u8.shape[:2]
                bag = bag_u8.reshape(bs, bag_l, -1)[..., :row].reshape(
                    bs, bag_l, self.img_size, self.img_size, 3
                )

                di = lax.axis_index("dp")

                def dp_blk(x):
                    return lax.dynamic_slice_in_dim(x, di * bs, bs, axis=0)

                bag_mask = dp_blk(valid)
                if shard_bag_:
                    off = jnp.int32(0)
                    for a in mp_axes:
                        off = off * mesh.shape[a] + lax.axis_index(a)
                    bag_mask = lax.dynamic_slice_in_dim(
                        bag_mask, off * bag_l, bag_l, axis=1
                    )
                out = {
                    "patch_bag": bag,
                    "bag_mask": bag_mask,
                    "sample_mask": dp_blk(sample_mask),
                }
                for k, col in _scalar_columns(
                    tables, slots, sample_mask
                ).items():
                    out[k] = dp_blk(col)
                return out

            bag_spec = P("dp", mp_axes) if shard_bag_ else P("dp")
            out_specs = {
                "patch_bag": bag_spec,
                "bag_mask": bag_spec,
                "sample_mask": P("dp"),
                **{k: P("dp") for k in self._scalar_keys},
            }
            if self._rna is not None:
                out_specs["rna_data"] = P("dp")
            self._assemble = jax.jit(
                shard_map(
                    _local,
                    mesh=mesh,
                    in_specs=(P(mesh.axis_names), P(), P(), P(), P()),
                    out_specs=out_specs,
                    check_rep=False,
                )
            )

    def shuffle(self):
        """Per-epoch in-slide permutation (reference ``models.py:269-272``).

        ``self.ids[wsi]`` are views into ``_ids_flat``, so shuffling them
        permutes the flat array; the device copy refreshes lazily (one
        KB-scale upload per epoch, not per step).
        """
        for wsi in self.ids:
            self._rng.shuffle(self.ids[wsi])
        self._ids_dirty = True

    def __len__(self) -> int:
        return len(self.base.index)

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int | None = None,
        skip_batches: int = 0,
        **_: object,  # loader kwargs (num_threads/prefetch) are host-only
    ) -> Iterator[dict]:
        import jax

        base = self.base
        order = np.arange(len(base.index))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        if self.mesh is not None and batch_size % self.mesh.shape["dp"]:
            raise ValueError(
                f"mesh-sharded cache needs batch_size ({batch_size}) "
                f"divisible by the mesh's dp axis "
                f"({self.mesh.shape['dp']})"
            )
        if self._ids_dirty:
            self._dev_ids = self._put(self._ids_flat)
            self._ids_dirty = False

        for s in range(skip_batches * batch_size, len(order), batch_size):
            sel = order[s : s + batch_size]
            b = len(sel)
            slots = self._item_slot[sel]
            sel_padded = np.zeros((batch_size,), np.int32)
            sel_padded[:b] = sel
            # ONE small H2D (`sel_padded`) + one dispatch; every array the
            # train step consumes comes back as a device-resident output
            batch: dict = self._assemble(
                self._cache, self._dev_ids, self._dev_tables, sel_padded,
                np.int32(b),
            )
            batch["WSI"] = [self._wsi_names[j] for j in slots] + [""] * (
                batch_size - b
            )
            batch["case"] = [self._case_names[j] for j in slots] + [""] * (
                batch_size - b
            )
            # host-side mirrors for consumers that must not sync on device
            # values (the train loop's logged-loss weight, eval's id masking)
            host_mask = np.zeros((batch_size,), bool)
            host_mask[:b] = True
            batch["host_sample_mask"] = host_mask
            for k in self._scalar_keys:
                col = np.zeros((batch_size,), self._scalars[k].dtype)
                col[:b] = self._scalars[k][slots]
                batch["host_" + k] = col
            yield batch
