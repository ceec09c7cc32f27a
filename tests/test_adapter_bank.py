"""Per-slot multi-adapter batched serving (VERDICT r4 #5).

An AdapterBank stacks N LoRA adapters ([L, N, ...] factors) so one batched
decode program serves requests with DIFFERENT fine-tuned adapters: each slot
mixes its adapter's low-rank delta into the backbone matmuls via a one-hot x
(alpha/rank) row.  These tests pin:

* bank construction: rank padding, missing-target zero fill, row() encoding,
  backbone-only target validation;
* transformer-level equivalence: the per-slot delta path == running the
  offline-merged weights (training/lora.py merge_lora), per slot, both cache
  forms (prefill scan + decode tuple);
* engine-level e2e: a B=3 batch with (adapter1, base, adapter2) slots decodes
  per-slot audio matching each merged single-stream model at temp=0.

The reference is inference-only with no adapters — this is a TPU-native
serving extension (ROADMAP "adapter traffic bypasses the batcher").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pocket_tts_tpu import weights
from pocket_tts_tpu.models.mimi import MimiPlans
from pocket_tts_tpu.runtime.engine import Engine, GenParams
from pocket_tts_tpu.training.lora import (
    LORA_DEFAULT_TARGETS,
    build_adapter_bank,
    init_lora,
    merge_lora,
    save_lora_params,
)
from pocket_tts_tpu.tts import TTSModel

from .test_tts import CFG


def _random_lora(params_fl, rank, seed, targets=LORA_DEFAULT_TARGETS):
    """Non-trivial factors (init_lora zeroes b => exact no-op; randomize it)."""
    lora = init_lora(params_fl, rank, targets=targets, seed=seed)
    rng = np.random.default_rng(seed + 100)
    return {
        t: {"a": f["a"],
            "b": jnp.asarray(rng.normal(0, 0.02, f["b"].shape), jnp.float32)}
        for t, f in lora.items()
    }


@pytest.fixture(scope="module")
def base():
    plans = MimiPlans(CFG.mimi)
    params = weights.random_params(CFG, plans, seed=21)
    return params


@pytest.fixture(scope="module")
def bank_paths(base, tmp_path_factory):
    d = tmp_path_factory.mktemp("adapters")
    l1 = _random_lora(base["flow_lm"], rank=2, seed=1)
    # adapter 2: different rank AND a target subset (exercises rank padding
    # and missing-target zero fill)
    l2 = _random_lora(base["flow_lm"], rank=3, seed=2,
                      targets=("tf/in_proj", "tf/ff1"))
    p1, p2 = d / "one.safetensors", d / "two.safetensors"
    save_lora_params(l1, p1, rank=2, alpha=4.0)
    save_lora_params(l2, p2, rank=3, alpha=3.0)
    return {"one": str(p1), "two": str(p2)}, {"one": (l1, 2, 4.0),
                                              "two": (l2, 3, 3.0)}


class TestBankBuild:
    def test_shapes_rows_scales(self, bank_paths):
        paths, loaded = bank_paths
        bank = build_adapter_bank(paths)
        assert bank.names == ("one", "two")
        assert set(bank.stacks) == {"in_proj", "out_proj", "ff1", "ff2"}
        a = bank.stacks["in_proj"]["a"]
        L = loaded["one"][0]["tf/in_proj"]["a"].shape[0]
        assert a.shape[:2] == (L, 2) and a.shape[-2] == 3  # r padded to max
        # adapter "two" never touches out_proj: its lane must be exact zero
        assert not np.any(np.asarray(bank.stacks["out_proj"]["a"][:, 1]))
        np.testing.assert_allclose(bank.row("one"), [4.0 / 2, 0.0])
        np.testing.assert_allclose(bank.row("two"), [0.0, 3.0 / 3])
        np.testing.assert_allclose(bank.row(None), [0.0, 0.0])
        with pytest.raises(KeyError):
            bank.row("nope")

    def test_rejects_unsupported_targets(self, base, tmp_path):
        """Bankability is judged against the exact target set the batched
        delta path applies — NOT a tf/ prefix: tf/norm1_w would stack fine
        and then be silently dropped at serving time, making audio depend on
        server occupancy (review finding r5)."""
        from pocket_tts_tpu.training.lora import bankable_lora_targets

        for targets in (("tf/in_proj", "input_w"),      # outside tf entirely
                        ("tf/in_proj", "tf/norm1_w")):  # tf/ but unsupported
            lora = _random_lora(base["flow_lm"], rank=2, seed=3,
                                targets=targets)
            p = tmp_path / "bad.safetensors"
            save_lora_params(lora, p, rank=2, alpha=2.0)
            with pytest.raises(ValueError, match="outside the batched"):
                build_adapter_bank({"bad": str(p)})
            # the server's startup gate shares the same definition
            assert not bankable_lora_targets(
                [f"{t}/{leaf}" for t in targets for leaf in ("a", "b")])
        assert bankable_lora_targets(
            [f"{t}/a" for t in LORA_DEFAULT_TARGETS])

    def test_empty(self):
        with pytest.raises(ValueError, match="at least one"):
            build_adapter_bank({})


class TestTransformerEquivalence:
    """cache_forward(lora, one-hot row) == cache_forward(merged params)."""

    def _run(self, base, bank, loaded, name, slot_row, stacked):
        from pocket_tts_tpu.models import transformer

        tcfg = CFG.flow_lm.transformer
        fl = base["flow_lm"]
        rng = np.random.default_rng(7)
        b, t = 2, 3
        x = jnp.asarray(rng.normal(size=(b, t, tcfg.d_model)), jnp.float32)
        pos = jnp.zeros((b,), jnp.int32)
        from pocket_tts_tpu.ops.rope import rope_table

        positions = pos[:, None] + jnp.arange(t)[None, :]
        cos, sin = rope_table(positions, tcfg.head_dim, tcfg.max_period)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
        kc = jnp.zeros((tcfg.num_layers, b, 16, tcfg.num_heads, tcfg.head_dim))
        vc = jnp.zeros_like(kc)
        if not stacked:
            kc = tuple(kc[i] for i in range(tcfg.num_layers))
            vc = tuple(vc[i] for i in range(tcfg.num_layers))
        w = jnp.asarray(np.broadcast_to(slot_row, (b, len(slot_row))),
                        jnp.float32)
        y_lora, _, _ = transformer.cache_forward(
            fl["tf"], tcfg.num_heads, kc, vc, pos, x, cos, sin,
            lora=bank.stacks, lora_w=w)
        lora, rank, alpha = loaded[name]
        merged = merge_lora(fl, lora, alpha=alpha, rank=rank)
        y_ref, _, _ = transformer.cache_forward(
            merged["tf"], tcfg.num_heads, kc, vc, pos, x, cos, sin)
        np.testing.assert_allclose(np.asarray(y_lora), np.asarray(y_ref),
                                   atol=2e-4, rtol=1e-4)

    @pytest.mark.parametrize("stacked", [True, False])
    @pytest.mark.parametrize("name,row_i", [("one", 0), ("two", 1)])
    def test_matches_merged(self, base, bank_paths, name, row_i, stacked):
        paths, loaded = bank_paths
        bank = build_adapter_bank(paths)
        self._run(base, bank, loaded, name, bank.row(name), stacked)

    def test_zero_row_is_base(self, base, bank_paths):
        from pocket_tts_tpu.models import transformer

        paths, _ = bank_paths
        bank = build_adapter_bank(paths)
        tcfg = CFG.flow_lm.transformer
        fl = base["flow_lm"]
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(1, 2, tcfg.d_model)), jnp.float32)
        pos = jnp.zeros((1,), jnp.int32)
        from pocket_tts_tpu.ops.rope import rope_table

        positions = pos[:, None] + jnp.arange(2)[None, :]
        cos, sin = rope_table(positions, tcfg.head_dim, tcfg.max_period)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
        kc = jnp.zeros((tcfg.num_layers, 1, 8, tcfg.num_heads, tcfg.head_dim))
        vc = jnp.zeros_like(kc)
        w = jnp.zeros((1, bank.n), jnp.float32)
        y0, _, _ = transformer.cache_forward(
            fl["tf"], tcfg.num_heads, kc, vc, pos, x, cos, sin,
            lora=bank.stacks, lora_w=w)
        y, _, _ = transformer.cache_forward(
            fl["tf"], tcfg.num_heads, kc, vc, pos, x, cos, sin)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y), atol=1e-6)


class TestEngineE2E:
    """B=3 batch: slot 0 = adapter one, slot 1 = base, slot 2 = adapter two;
    per-slot audio vs each merged single-stream engine at temp=0."""

    K = 8  # frames

    def _single(self, cfg, params, tokens, n_tokens, key):
        eng = Engine(cfg, params, batch_size=1)
        st = eng.new_state(1)
        row = eng.pad_token_row(tokens)
        # the snapshot must be distinct buffers: admit donates the state, and
        # donate(st) alongside st["kc"] as a second arg is the classic
        # donated-buffer-reuse error
        empty = {"kc": jnp.zeros_like(st["kc"]), "vc": jnp.zeros_like(st["vc"]),
                 "pos": jnp.zeros((1,), jnp.int32)}
        st = eng.admit_prefill_slot(st, 0, empty, row, n_tokens)
        st, _, audio, _ = eng.decode_frames(st, key, self.K,
                                            GenParams(temp=0.0))
        return eng.wire_to_float(audio)[0]

    def test_mixed_batch_matches_merged(self, base, bank_paths):
        paths, loaded = bank_paths
        bank = build_adapter_bank(paths)
        eng = Engine(CFG, base, batch_size=3)
        eng.set_adapter_bank(bank)
        key = jax.random.PRNGKey(0)
        rng = np.random.default_rng(5)
        toks = [rng.integers(1, 40, size=(1, n)).astype(np.int32)
                for n in (5, 4, 6)]
        names = ["one", None, "two"]
        st = eng.new_state(3)
        empty = {"kc": jnp.zeros_like(st["kc"][:, :1]),
                 "vc": jnp.zeros_like(st["vc"][:, :1]),
                 "pos": jnp.zeros((1,), jnp.int32)}
        rows = np.stack([bank.row(n) for n in names])
        for i in range(3):
            st = eng.admit_prefill_slot(st, i, empty, eng.pad_token_row(toks[i]),
                                        toks[i].shape[1], lora_row=rows[i])
        st, _, audio, _ = eng.decode_frames(st, key, self.K,
                                            GenParams(temp=0.0), lora_w=rows)
        audio = eng.wire_to_float(audio)

        for i, name in enumerate(names):
            if name is None:
                ref_params = base
            else:
                lora, rank, alpha = loaded[name]
                ref_params = {**base, "flow_lm": merge_lora(
                    base["flow_lm"], lora, alpha=alpha, rank=rank)}
            ref = self._single(CFG, ref_params, toks[i], toks[i].shape[1], key)
            # f32 CPU: only batch-lane accumulation drift + merge-vs-delta
            # association differ; the AR loop amplifies both
            corr = np.corrcoef(audio[i], ref)[0, 1]
            assert corr > 0.999, f"slot {i} ({name}): corr {corr}"
            assert np.max(np.abs(audio[i] - ref)) < 60 / 32767, \
                f"slot {i} ({name})"

    def test_lora_w_without_bank_raises(self, base):
        eng = Engine(CFG, base, batch_size=2)
        st = eng.new_state(2)
        with pytest.raises(ValueError, match="set_adapter_bank"):
            eng.decode_frames(st, jax.random.PRNGKey(0), 2,
                              GenParams(temp=0.0),
                              lora_w=np.zeros((2, 1), np.float32))


class TestBatcherAdapters:
    """Concurrent requests with DIFFERENT adapter fields ride ONE batched
    decode loop (the server previously serialized them through per-adapter
    merged engines — ROADMAP 'adapter traffic bypasses the batcher')."""

    TEXT = "The quick brown fox jumps over the lazy dog."

    def test_concurrent_mixed_adapters_match_merged(self, base, bank_paths):
        from pocket_tts_tpu.runtime.batcher import ContinuousBatcher

        paths, loaded = bank_paths
        bank = build_adapter_bank(paths)
        model = TTSModel(CFG, base, gen=GenParams(temp=0.0),
                         has_real_weights=False)
        b = ContinuousBatcher(model, batch_size=3, chunk_frames=4,
                              adapter_bank=bank)
        b.start()
        names = ["one", None, "two"]
        try:
            outs = [b.submit(self.TEXT, adapter=n, latency_sensitive=False)
                    for n in names]
            got = [b._drain(o) for o in outs]
        finally:
            b.stop()
        refs = []
        for i, name in enumerate(names):
            if name is None:
                ref_model = model
            else:
                lora, rank, alpha = loaded[name]
                merged = {**base, "flow_lm": merge_lora(
                    base["flow_lm"], lora, alpha=alpha, rank=rank)}
                ref_model = TTSModel(CFG, merged, gen=GenParams(temp=0.0),
                                     has_real_weights=False)
            want = ref_model.generate_with_pauses(self.TEXT)
            refs.append(want)
            assert got[i].shape == want.shape, f"slot {i} ({name})"
            corr = np.corrcoef(got[i], want)[0, 1]
            assert corr > 0.999, f"slot {i} ({name}): corr {corr}"
            np.testing.assert_allclose(got[i], want, atol=2e-3,
                                       err_msg=f"slot {i} ({name})")
        # sanity: the adapters actually change the audio (same text/voice)
        n = min(len(refs[0]), len(refs[1]))
        assert not np.allclose(refs[0][:n], refs[1][:n], atol=2e-3)

    def test_generate_batch_per_item_adapters(self, base, bank_paths):
        """Offline batch synthesis with per-item adapters: mixed items ride
        one loop and match their merged single-stream models at temp=0."""
        from pocket_tts_tpu.runtime.batcher import ContinuousBatcher

        paths, loaded = bank_paths
        bank = build_adapter_bank(paths)
        model = TTSModel(CFG, base, gen=GenParams(temp=0.0),
                         has_real_weights=False)
        b = ContinuousBatcher(model, batch_size=3, chunk_frames=4,
                              adapter_bank=bank)
        b.start()
        try:
            got = b.generate_batch([self.TEXT] * 3,
                                   adapters=["one", None, "two"])
        finally:
            b.stop()
        lora, rank, alpha = loaded["one"]
        merged = {**base, "flow_lm": merge_lora(base["flow_lm"], lora,
                                                alpha=alpha, rank=rank)}
        ref = TTSModel(CFG, merged, gen=GenParams(temp=0.0),
                       has_real_weights=False).generate_with_pauses(self.TEXT)
        np.testing.assert_allclose(got[0], ref, atol=2e-3)
        base_ref = model.generate_with_pauses(self.TEXT)
        np.testing.assert_allclose(got[1], base_ref, atol=2e-3)

    def test_unknown_or_bankless_adapter_raises(self, base, bank_paths):
        from pocket_tts_tpu.runtime.batcher import ContinuousBatcher

        paths, _ = bank_paths
        model = TTSModel(CFG, base, gen=GenParams(temp=0.0),
                         has_real_weights=False)
        b = ContinuousBatcher(model, batch_size=2, chunk_frames=4)
        with pytest.raises(ValueError, match="no adapter bank"):
            b.submit(self.TEXT, adapter="one")
        b2 = ContinuousBatcher(model, batch_size=2, chunk_frames=4,
                               adapter_bank=build_adapter_bank(paths))
        with pytest.raises(KeyError, match="nope"):
            b2.submit(self.TEXT, adapter="nope")
