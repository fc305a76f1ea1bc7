"""L2 model tests: YOLOv10 forward/postprocess, BEiT numerical equivalence
against HF torch (golden architecture + converter test), converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dlm.models.beit import BeitClassifier, BeitConfig, preprocess_crops
from tpu3dlm.models.weights import (
    assert_tree_matches,
    convert_beit_state_dict,
    convert_yolov10_state_dict,
)
from tpu3dlm.models.yolov10 import REG_MAX, YOLOv10, make_anchors, postprocess


@pytest.fixture(scope="module")
def yolo_n():
    model = YOLOv10(nc=8, variant="n")
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


class TestYOLOv10:
    @pytest.mark.slow  # full 640px YOLO forward
    def test_forward_shapes(self, yolo_n):
        model, variables = yolo_n
        x = jnp.zeros((2, 128, 128, 3), jnp.float32)
        out = model.apply(variables, x)
        assert len(out["one2one"]) == 3
        for o, s in zip(out["one2one"], (8, 16, 32)):
            assert o.shape == (2, 128 // s, 128 // s, 4 * REG_MAX + 8)

    @pytest.mark.slow  # full 640px postprocess
    def test_postprocess_static_shapes(self, yolo_n):
        model, variables = yolo_n
        x = jnp.zeros((2, 128, 128, 3), jnp.float32)
        out = model.apply(variables, x)
        post = postprocess(out["one2one"], img_size=128, max_det=20)
        assert post["boxes"].shape == (2, 20, 4)
        assert post["conf"].shape == (2, 20)
        assert post["label"].shape == (2, 20)
        # conf sorted descending
        conf = np.asarray(post["conf"])
        assert (np.diff(conf, axis=1) <= 1e-6).all()

    def test_postprocess_per_level_bit_identical(self, yolo_n, rng):
        """The round-4 per-level postprocess (reductions before any concat
        — the ledger's 5.8% concat cost) must be BIT-identical to the
        original whole-tensor-concat path on random activations."""
        model, variables = yolo_n
        x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)).astype(np.float32))
        raw = model.apply(variables, x)["one2one"]
        a = postprocess(raw, img_size=128, max_det=20, per_level=True)
        b = postprocess(raw, img_size=128, max_det=20, per_level=False)
        for k in ("boxes", "conf", "label"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_postprocess_split_head_bit_identical(self, yolo_n, rng):
        """The pre-concat (box, cls) head output ("one2one_split" — lets
        XLA DCE the head concat) must postprocess bit-identically to the
        concatenated maps, in both per_level modes."""
        model, variables = yolo_n
        x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)).astype(np.float32))
        out = model.apply(variables, x)
        # the split tuples ARE the concat's operands
        for (b, c), r in zip(out["one2one_split"], out["one2one"]):
            np.testing.assert_array_equal(
                np.asarray(jnp.concatenate([b, c], axis=-1)), np.asarray(r)
            )
        for per_level in (True, False):
            a = postprocess(out["one2one"], img_size=128, max_det=20,
                            per_level=per_level)
            s = postprocess(out["one2one_split"], img_size=128, max_det=20,
                            per_level=per_level)
            for k in ("boxes", "conf", "label"):
                np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(s[k]))

    def test_anchors(self):
        anchors, strides = make_anchors(128)
        n = (128 // 8) ** 2 + (128 // 16) ** 2 + (128 // 32) ** 2
        assert anchors.shape == (n, 2)
        assert strides.shape == (n,)
        np.testing.assert_allclose(np.asarray(anchors[0]), [0.5, 0.5])
        assert float(strides[0]) == 8.0 and float(strides[-1]) == 32.0

    def test_decode_centered_box(self, yolo_n):
        """Uniform DFL logits → expected offset (REG_MAX-1)/2 per side."""
        from tpu3dlm.models.yolov10 import decode_raw

        raw = [jnp.zeros((1, 128 // s, 128 // s, 4 * REG_MAX + 8)) for s in (8, 16, 32)]
        boxes, cls = decode_raw(raw, 128)
        anchors, strides = make_anchors(128)
        off = (REG_MAX - 1) / 2.0
        want_x1 = (np.asarray(anchors)[:, 0] - off) * np.asarray(strides)
        np.testing.assert_allclose(np.asarray(boxes[0, :, 0]), want_x1, rtol=1e-5)

    def test_batch_invariance(self, yolo_n):
        model, variables = yolo_n
        rng = np.random.default_rng(0)
        img = jnp.array(rng.uniform(size=(1, 128, 128, 3)), jnp.float32)
        single = model.apply(variables, img)["one2one"][0]
        batched = model.apply(variables, jnp.concatenate([img, img]))["one2one"][0]
        np.testing.assert_allclose(
            np.asarray(single[0]), np.asarray(batched[1]), atol=1e-5
        )


class TestYoloConverter:
    def test_roundtrip_structure(self, yolo_n):
        """Reverse-map the flax tree to ultralytics keys, convert back, and
        require an exact structural/shape match."""
        model, variables = yolo_n
        sd = {}

        def emit(tree, path, collection):
            for k, v in tree.items():
                if isinstance(v, dict):
                    emit(v, path + [k], collection)
                else:
                    sd[_torch_key(path + [k], collection)] = _torch_val(
                        np.asarray(v), path + [k]
                    )

        def _torch_key(path, collection):
            toks = []
            scope = path[0]
            if scope.startswith("detect_"):
                branch_prefix = "" if scope == "detect_o2m" else "one2one_"
                name = path[1]  # e.g. cv2_0_1
                parts = name.split("_")
                toks = ["model", "23", branch_prefix + parts[0], *parts[1:]]
                rest = path[2:]
            else:
                toks = ["model", scope[1:]]
                rest = path[1:]
            for t in rest[:-1]:
                toks.extend(t.split("_") if _is_seq(t) else [t])
            leaf = rest[-1]
            parent = toks[-1]
            leafmap_params = {"kernel": "weight", "scale": "weight", "bias": "bias"}
            leafmap_stats = {"mean": "running_mean", "var": "running_var"}
            toks.append(
                leafmap_params[leaf] if collection == "params" else leafmap_stats[leaf]
            )
            del parent
            return ".".join(toks)

        def _is_seq(t):
            parts = t.split("_")
            return len(parts) > 1 and all(p.isdigit() for p in parts[1:])

        def _torch_val(v, path):
            if path[-1] == "kernel":
                if v.ndim == 4:
                    return np.transpose(v, (3, 2, 0, 1))
                return v.T
            return v

        emit(variables["params"], [], "params")
        emit(variables["batch_stats"], [], "batch_stats")

        converted = convert_yolov10_state_dict(sd)
        problems = assert_tree_matches(
            converted["params"], jax.tree.map(np.asarray, variables["params"])
        )
        problems += assert_tree_matches(
            converted["batch_stats"], jax.tree.map(np.asarray, variables["batch_stats"])
        )
        assert not problems, problems[:20]

        # values survive the transpose round-trip bit-exactly
        flat_c = jax.tree_util.tree_leaves(converted["params"])
        flat_r = jax.tree_util.tree_leaves(
            jax.tree.map(np.asarray, variables["params"])
        )
        for a, b in zip(flat_c, flat_r):
            np.testing.assert_array_equal(a, b)


class TestUltralyticsCheckpointShim:
    @pytest.mark.slow  # real torch checkpoint load
    def test_object_checkpoint_loads_without_package(self, tmp_path):
        """Real ultralytics best.pt files pickle the MODEL OBJECT
        (ultralytics.nn.tasks.DetectionModel); loading them must work with
        the ultralytics package absent (reference detector.py:36 consumes
        exactly such a file). We fabricate the package just long enough to
        save the object, delete it, and load through the shim."""
        torch = pytest.importorskip("torch")
        import sys
        import types

        from torch_yolov10_ref import TorchYOLOv10, randomize_

        from tpu3dlm.models.weights import load_torch_state_dict

        pkg = types.ModuleType("ultralytics")
        nnm = types.ModuleType("ultralytics.nn")
        tasks = types.ModuleType("ultralytics.nn.tasks")

        class DetectionModel(TorchYOLOv10):
            pass

        DetectionModel.__module__ = "ultralytics.nn.tasks"
        DetectionModel.__qualname__ = "DetectionModel"
        tasks.DetectionModel = DetectionModel
        sys.modules.update(
            {"ultralytics": pkg, "ultralytics.nn": nnm, "ultralytics.nn.tasks": tasks}
        )
        try:
            m = DetectionModel(nc=4, variant="n")
            randomize_(m, seed=2)
            want = {k: v.numpy().copy() for k, v in m.state_dict().items()}
            path = str(tmp_path / "best.pt")
            torch.save({"model": m, "epoch": 3}, path)
        finally:
            for k in ("ultralytics", "ultralytics.nn", "ultralytics.nn.tasks"):
                sys.modules.pop(k, None)

        assert "ultralytics" not in sys.modules
        sd = load_torch_state_dict(path)
        assert "ultralytics" not in sys.modules  # shim cleans up after itself
        assert set(sd) == set(want)
        for k in want:
            np.testing.assert_array_equal(sd[k], want[k])

        # and it converts structurally, like any ultralytics checkpoint
        variables = convert_yolov10_state_dict(sd)
        ref = YOLOv10(nc=4, variant="n").init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )
        problems = assert_tree_matches(
            variables["params"], jax.tree.map(np.asarray, ref["params"])
        )
        assert not problems, problems[:10]


class TestS2DStem:
    def test_space_to_depth_blocks(self):
        from tpu3dlm.models.yolov10 import space_to_depth

        x = jnp.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(jnp.float32)
        y = space_to_depth(x, 2)
        assert y.shape == (2, 2, 2, 12)
        # block (0,0) of batch 0: rows 0-1 × cols 0-1, channel-major per pixel
        np.testing.assert_array_equal(
            np.asarray(y[0, 0, 0]),
            np.concatenate([np.asarray(x[0, i, j]) for i in (0, 1) for j in (0, 1)]),
        )

    @pytest.mark.slow  # two full stem compiles
    def test_s2d_stem_output_shapes_match_conv(self):
        """The utilisation-experiment stem must be a drop-in: identical
        output shapes at every scale (weights differ — checkpoints require
        the default stem)."""
        a = YOLOv10(nc=3, variant="n", stem="s2d")
        b = YOLOv10(nc=3, variant="n")
        va = a.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        vb = b.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        oa = a.apply(va, jnp.zeros((2, 64, 64, 3)))
        ob = b.apply(vb, jnp.zeros((2, 64, 64, 3)))
        assert [o.shape for o in oa["one2one"]] == [o.shape for o in ob["one2one"]]


class TestUltralyticsPackageGolden:
    """Provenance against the REAL ultralytics package (VERDICT round-1
    item 1): the in-repo torch transcription (torch_yolov10_ref.py) could
    share a transcription error with the Flax graph and still pass the
    goldens above. Here a genuine `ultralytics`-built YOLOv10, serialized
    the way a real best.pt is, goes through `load_torch_state_dict` →
    `convert_yolov10_state_dict`, and the Flax forward must match the
    package's own forward. Skipped when ultralytics is not installed
    (CI installs it; the baked local image does not)."""

    @pytest.mark.parametrize("variant", ["s", "m", "b", "l", "x"])
    def test_genuine_package_tree_structure(self, variant, tmp_path):
        """STRUCTURAL golden for every variant against the real package:
        builds YOLO('yolov10{v}.yaml'), converts its state dict, and
        asserts the converted tree matches our Flax init tree exactly —
        the arbiter for the per-variant CIB override table
        (models/yolov10.py _CIB_OVERRIDES). Forward equivalence runs for n
        below; a structural mismatch here means the wrong architecture."""
        ultralytics = pytest.importorskip("ultralytics")
        torch = pytest.importorskip("torch")
        from tpu3dlm.models.weights import load_torch_state_dict

        dm = ultralytics.YOLO(f"yolov10{variant}.yaml").model.float().eval()
        nc = int(dm.yaml.get("nc", 80))
        ckpt_path = str(tmp_path / "best.pt")
        torch.save({"model": dm, "epoch": 0}, ckpt_path)
        variables = convert_yolov10_state_dict(load_torch_state_dict(ckpt_path))
        model = YOLOv10(nc=nc, variant=variant)
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        problems = assert_tree_matches(
            variables["params"], jax.tree.map(np.asarray, ref["params"])
        )
        problems += assert_tree_matches(
            variables["batch_stats"], jax.tree.map(np.asarray, ref["batch_stats"])
        )
        assert not problems, problems[:20]

    def test_genuine_checkpoint_forward_equivalence(self, tmp_path):
        ultralytics = pytest.importorskip("ultralytics")
        torch = pytest.importorskip("torch")
        from tpu3dlm.models.weights import load_torch_state_dict

        # built from the yaml the package ships — no network, random init
        # (VERDICT: "random init is enough"); nc comes from the yaml (80)
        dm = ultralytics.YOLO("yolov10n.yaml").model.float().eval()
        nc = int(dm.yaml.get("nc", 80))

        # serialize exactly like ultralytics' trainer writes best.pt
        # (a dict pickling the MODEL OBJECT under "model")
        ckpt_path = str(tmp_path / "best.pt")
        torch.save({"model": dm, "epoch": 0}, ckpt_path)
        sd = load_torch_state_dict(ckpt_path)

        variables = convert_yolov10_state_dict(sd)
        model = YOLOv10(nc=nc, variant="n")
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        problems = assert_tree_matches(
            variables["params"], jax.tree.map(np.asarray, ref["params"])
        )
        problems += assert_tree_matches(
            variables["batch_stats"], jax.tree.map(np.asarray, ref["batch_stats"])
        )
        assert not problems, problems[:20]

        # raw-head forward from the genuine package: flip only the head's
        # training flag so v10Detect returns its raw one2many/one2one maps
        # while BatchNorms stay in eval (running-stats) mode
        dm.model[-1].training = True
        rng = np.random.default_rng(5)
        img = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            out_t = dm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        if isinstance(out_t, tuple):  # some versions return (y, raw)
            out_t = out_t[-1]
        # loud contract check: an upstream release changing v10Detect's
        # training-mode output shape must fail HERE with the version named,
        # not downstream as a confusing tensor mismatch
        assert isinstance(out_t, dict) and "one2one" in out_t, (
            f"ultralytics {getattr(ultralytics, '__version__', '?')} "
            f"v10Detect training-mode output contract changed: {type(out_t)}"
        )

        out_f = model.apply(variables, jnp.array(img))
        for branch in ("one2many", "one2one"):
            for f, t in zip(out_f[branch], out_t[branch]):
                np.testing.assert_allclose(
                    np.asarray(f).transpose(0, 3, 1, 2),
                    t.detach().numpy(),
                    atol=5e-4,
                    rtol=1e-3,
                    err_msg=f"ultralytics/{branch}",
                )


@pytest.mark.slow  # multi-variant torch-golden forwards
class TestYoloTorchGolden:
    """Numeric golden: ultralytics-format torch YOLOv10 → converter → Flax
    forward equivalence (VERDICT r1 item 3 — a wrong BN epsilon, padding, or
    head-order assumption in the converter must fail here). Matches the
    reference's loading of finetuned ultralytics checkpoints
    (src/detector/detector.py:36)."""

    @pytest.mark.parametrize("variant", ["n", "s", "m", "b"])
    def test_forward_matches_torch(self, variant):
        torch = pytest.importorskip("torch")
        from torch_yolov10_ref import TorchYOLOv10, randomize_

        tm = TorchYOLOv10(nc=8, variant=variant).eval()
        randomize_(tm, seed=1)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        # ultralytics key-scheme spot checks (what a real best.pt contains)
        for key in (
            "model.0.conv.weight",
            "model.2.m.0.cv1.conv.weight",
            "model.2.cv1.bn.running_var",
            "model.10.attn.qkv.conv.weight",
            "model.23.cv2.0.2.bias",
            "model.23.cv3.0.0.0.conv.weight",
            "model.23.one2one_cv2.0.0.conv.weight",
        ):
            assert key in sd, key

        variables = convert_yolov10_state_dict(sd)
        model = YOLOv10(nc=8, variant=variant)
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        problems = assert_tree_matches(
            variables["params"], jax.tree.map(np.asarray, ref["params"])
        )
        problems += assert_tree_matches(
            variables["batch_stats"], jax.tree.map(np.asarray, ref["batch_stats"])
        )
        assert not problems, problems[:20]

        rng = np.random.default_rng(3)
        img = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            o2m_t, o2o_t = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        out = model.apply(variables, jnp.array(img))
        for branch, want in (("one2many", o2m_t), ("one2one", o2o_t)):
            for f, t in zip(out[branch], want):
                np.testing.assert_allclose(
                    np.asarray(f).transpose(0, 3, 1, 2),
                    t.numpy(),
                    atol=5e-4,
                    rtol=1e-3,
                    err_msg=f"{variant}/{branch}",
                )


class TestBeit:
    @pytest.mark.slow  # HF torch golden forward
    def test_matches_hf_torch(self):
        """Random-weight HF torch BEiT vs converted Flax — logits must match."""
        torch = pytest.importorskip("torch")
        from transformers import BeitConfig as HFConfig
        from transformers import BeitForImageClassification

        hf_cfg = HFConfig(
            image_size=32,
            patch_size=16,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=64,
            num_labels=3,
            use_relative_position_bias=True,
            use_mean_pooling=True,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        hf = BeitForImageClassification(hf_cfg).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

        cfg = BeitConfig(
            image_size=32,
            patch_size=16,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            num_labels=3,
        )
        flax_model = BeitClassifier(cfg)
        variables = convert_beit_state_dict(sd)

        rng = np.random.default_rng(0)
        img = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = hf(torch.from_numpy(img.transpose(0, 3, 1, 2))).logits.numpy()
        got = np.asarray(flax_model.apply(variables, jnp.array(img)))
        np.testing.assert_allclose(got, want, atol=2e-4)

    @pytest.mark.slow  # full HF conversion
    def test_converter_covers_tree(self):
        torch = pytest.importorskip("torch")
        from transformers import BeitConfig as HFConfig
        from transformers import BeitForImageClassification

        hf_cfg = HFConfig(
            image_size=32,
            patch_size=16,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=64,
            num_labels=3,
            use_relative_position_bias=True,
            use_mean_pooling=True,
        )
        hf = BeitForImageClassification(hf_cfg)
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        converted = convert_beit_state_dict(sd)

        cfg = BeitConfig(
            image_size=32, patch_size=16, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64, num_labels=3,
        )
        ref = BeitClassifier(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
        problems = assert_tree_matches(
            converted["params"], jax.tree.map(np.asarray, ref["params"])
        )
        assert not problems, problems[:20]

    def test_preprocess(self):
        x = preprocess_crops(jnp.full((1, 4, 4, 3), 255, jnp.uint8))
        np.testing.assert_allclose(np.asarray(x), 1.0, atol=1e-6)
        x = preprocess_crops(jnp.zeros((1, 4, 4, 3), jnp.uint8))
        np.testing.assert_allclose(np.asarray(x), -1.0, atol=1e-6)

    @pytest.mark.slow  # full-depth BEiT twice
    def test_bf16_fast_path_tracks_f32(self):
        """The bf16 inference path (bf16 QK logits before bias+softmax,
        BeitAttention) must agree with the golden-tested f32 path: same
        top-1 on every decisive crop, small softmax-probability drift.
        Guards the fast path the HF goldens don't cover (ADVICE round 1)."""
        cfg = BeitConfig(
            image_size=32, patch_size=16, hidden_size=64, num_layers=2,
            num_heads=4, intermediate_size=128, num_labels=3,
        )
        f32 = BeitClassifier(cfg, dtype=jnp.float32)
        bf16 = BeitClassifier(cfg, dtype=jnp.bfloat16)
        variables = f32.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        # flax init leaves biases / cls token / rel-pos table at zero —
        # perturb every leaf so attention bias and head actually contribute
        leaves, treedef = jax.tree.flatten(variables)
        keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
        leaves = [
            leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
            for leaf, k in zip(leaves, keys)
        ]
        variables = jax.tree.unflatten(treedef, leaves)

        rng = np.random.default_rng(3)
        crops = rng.integers(0, 256, size=(16, 32, 32, 3), dtype=np.uint8)
        x = preprocess_crops(jnp.asarray(crops))
        logits32 = np.asarray(f32.apply(variables, x), np.float32)
        logits16 = np.asarray(bf16.apply(variables, x), np.float32)

        p32 = jax.nn.softmax(logits32, axis=-1)
        p16 = jax.nn.softmax(logits16, axis=-1)
        drift = float(np.max(np.abs(np.asarray(p32) - np.asarray(p16))))
        assert drift < 0.05, f"softmax drift {drift}"

        top = np.sort(logits32, axis=-1)
        margin = top[:, -1] - top[:, -2]
        decisive = margin > 2 * drift * np.abs(logits32).max()
        assert decisive.any()  # the check below must actually bite
        agree = logits32.argmax(-1) == logits16.argmax(-1)
        assert agree[decisive].all(), (
            f"bf16 flipped a decisive top-1: margins {margin[~agree]}"
        )


class TestPallasAttention:
    """ops/pallas/attention.py — fused BEiT attention (VMEM-resident scores,
    broadcast relative-position bias). Kernel correctness runs in interpret
    mode on the CPU suite; the module-level rewiring (head-major layout,
    bias transpose, custom-VJP dispatcher) is pinned against the einsum
    path. On-chip exactness + timing: scripts/profile_stages.py."""

    def _qkvb(self, rng, h, B, N, d, dtype=jnp.float32):
        mk = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)
        return (
            mk(h, B, N, d), mk(h, B, N, d), mk(h, B, N, d),
            jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32),
        )

    @pytest.mark.parametrize(
        "shape,bb",
        [
            ((2, 3, 5, 4), 8),    # B < block_b → block shrinks to B
            ((2, 5, 7, 4), 2),    # B % block_b != 0 → zero-pad path
            ((3, 4, 33, 16), 4),  # N not a lane multiple
        ],
    )
    def test_kernel_matches_reference_interpret(self, rng, shape, bb):
        if jax.default_backend() == "tpu":
            pytest.skip("interpret-mode check is a CPU-suite test")
        from jax.experimental.pallas import tpu as pltpu

        from tpu3dlm.ops.pallas.attention import (
            beit_attention_pallas,
            beit_attention_reference,
        )

        h, B, N, d = shape
        q, k, v, bias = self._qkvb(rng, h, B, N, d)
        with pltpu.force_tpu_interpret_mode():
            out = beit_attention_pallas(q, k, v, bias, block_b=bb)
        ref = beit_attention_reference(q, k, v, bias)
        assert out.shape == (h, B, N, d)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_kernel_bf16_inputs_interpret(self, rng):
        if jax.default_backend() == "tpu":
            pytest.skip("interpret-mode check is a CPU-suite test")
        from jax.experimental.pallas import tpu as pltpu

        from tpu3dlm.ops.pallas.attention import (
            beit_attention_pallas,
            beit_attention_reference,
        )

        q, k, v, bias = self._qkvb(rng, 2, 4, 9, 8, jnp.bfloat16)
        with pltpu.force_tpu_interpret_mode():
            out = beit_attention_pallas(q, k, v, bias)
        ref = beit_attention_reference(q, k, v, bias)
        # identical op sequence (f32 scores from bf16 operands) → the only
        # divergence is the final bf16 round-off of matching f32 values
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=1e-2, rtol=1e-2,
        )

    @pytest.mark.slow  # full-depth BEiT both impls
    def test_module_pallas_impl_matches_einsum(self):
        """attn_impl='pallas' reroutes through the head-major dispatcher
        (the einsum twin off-TPU): classification logits must match the
        default einsum path to f32 round-off."""
        kw = dict(
            image_size=32, patch_size=16, hidden_size=64, num_layers=2,
            num_heads=4, intermediate_size=128, num_labels=3,
        )
        ein = BeitClassifier(BeitConfig(attn_impl="einsum", **kw))
        pal = BeitClassifier(BeitConfig(attn_impl="pallas", **kw))
        variables = ein.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        leaves, treedef = jax.tree.flatten(variables)
        keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
        variables = jax.tree.unflatten(
            treedef,
            [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, keys)],
        )
        rng = np.random.default_rng(5)
        x = preprocess_crops(
            jnp.asarray(rng.integers(0, 256, size=(6, 32, 32, 3), dtype=np.uint8))
        )
        np.testing.assert_allclose(
            np.asarray(pal.apply(variables, x)),
            np.asarray(ein.apply(variables, x)),
            atol=1e-5, rtol=1e-4,
        )

    def test_custom_vjp_matches_reference_grads(self, rng):
        """Finetuning differentiates through the dispatcher: the custom VJP
        (recompute via the einsum twin) must produce the reference grads."""
        from tpu3dlm.ops.pallas.attention import (
            beit_attention,
            beit_attention_reference,
        )

        q, k, v, bias = self._qkvb(rng, 2, 3, 9, 8)
        w = jnp.asarray(rng.standard_normal((2, 3, 9, 8)), jnp.float32)

        def loss_disp(q, k, v, bias):
            return jnp.sum(beit_attention(q, k, v, bias) * w)

        def loss_ref(q, k, v, bias):
            return jnp.sum(beit_attention_reference(q, k, v, bias) * w)

        g_disp = jax.grad(loss_disp, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(g_disp, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )


class TestPackedPallasAttention:
    """Packed-layout fused attention (ops/pallas/attention.py::
    beit_attention_packed_*): the kernel reads the raw (B, N, h·d) Dense
    outputs — no head-major transposes exist in the program (PERF.md
    round 5: those transposes cost 78% of the head-major kernel's
    runtime). Correctness in interpret mode; the module now routes its
    pallas path through this kernel."""

    def _qkvb(self, rng, B, N, h, d, dtype=jnp.float32):
        mk = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)
        return (
            mk(B, N, h * d), mk(B, N, h * d), mk(B, N, h * d),
            jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32),
        )

    @pytest.mark.parametrize(
        "shape,bb",
        [
            ((3, 5, 2, 64), 8),   # hp=2 lane-aligned pairs; B < block_b
            ((5, 7, 4, 32), 2),   # hp=4; B % block_b != 0 → zero-pad path
            ((4, 33, 3, 16), 4),  # h=3: hp falls back to a divisor (3)
            ((2, 9, 12, 64), 16), # BEiT-base head layout
        ],
    )
    def test_packed_matches_reference_interpret(self, rng, shape, bb):
        if jax.default_backend() == "tpu":
            pytest.skip("interpret-mode check is a CPU-suite test")
        from tpu3dlm.ops.pallas.attention import (
            beit_attention_packed_pallas,
            beit_attention_packed_reference,
        )

        B, N, h, d = shape
        q, k, v, bias = self._qkvb(rng, B, N, h, d)
        out = beit_attention_packed_pallas(
            q, k, v, bias, h, block_b=bb, interpret=True
        )
        ref = beit_attention_packed_reference(q, k, v, bias, h)
        assert out.shape == (B, N, h * d)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_packed_matches_headmajor_kernel(self, rng):
        """The packed and head-major kernels are the same math — pin them
        against each other through their layouts."""
        if jax.default_backend() == "tpu":
            pytest.skip("interpret-mode check is a CPU-suite test")
        from tpu3dlm.ops.pallas.attention import (
            beit_attention_packed_pallas, beit_attention_pallas,
        )

        B, N, h, d = 3, 11, 2, 32
        q, k, v, bias = self._qkvb(rng, B, N, h, d)
        packed = beit_attention_packed_pallas(q, k, v, bias, h, interpret=True)

        def split(t):
            return t.reshape(B, N, h, d).transpose(2, 0, 1, 3)

        hm = beit_attention_pallas(
            split(q), split(k), split(v), bias, interpret=True
        )
        hm_packed = hm.transpose(1, 2, 0, 3).reshape(B, N, h * d)
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(hm_packed), atol=1e-5, rtol=1e-5
        )

    def test_packed_custom_vjp_matches_reference_grads(self, rng):
        from tpu3dlm.ops.pallas.attention import (
            beit_attention_packed, beit_attention_packed_reference,
        )

        B, N, h, d = 2, 7, 2, 8
        q, k, v, bias = self._qkvb(rng, B, N, h, d)

        def loss_kernel(q_, k_, v_, b_):
            return (beit_attention_packed(q_, k_, v_, b_, h) ** 2).sum()

        def loss_ref(q_, k_, v_, b_):
            return (
                beit_attention_packed_reference(q_, k_, v_, b_, h) ** 2
            ).sum()

        g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )
