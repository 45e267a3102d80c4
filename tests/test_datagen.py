"""Synthetic-data factory tests: orchestration, sharding/resume, filtering."""

import json

import numpy as np
import pytest

from s3od_tpu.datagen.filtering import (
    DatasetLoader,
    FilterPipeline,
    FilterResult,
    BaseFilter,
    calculate_iou,
)
from s3od_tpu.datagen.generate_train_images import (
    GenerationConfig,
    ImageMaskGenerationPipeline,
    ProceduralBackend,
)
from s3od_tpu.datagen.prompts import FilePromptProvider, ImagePromptGenerator
from s3od_tpu.datagen.resizer import FluxResizer, select_bucket
from s3od_tpu.datagen.sharding import detect_task, filter_unprocessed, task_slice


def test_resolution_buckets():
    r = FluxResizer()
    assert select_bucket(1000, 1000) == (1024, 1024)
    assert select_bucket(480, 640)[0] < select_bucket(480, 640)[1]  # landscape
    for h, w in r.get_compatible_resolutions():
        assert r.verify_compatibility(h, w)
        assert abs(h * w - 1024 * 1024) < 1024 * 1024 * 0.2
    img = np.zeros((500, 1000, 3), np.uint8)
    out, (th, tw) = r.resize_image(img)
    assert out.shape[:2] == (th, tw) and th % 32 == 0 and tw % 32 == 0
    mask = np.zeros((500, 1000), np.uint8)
    assert r.resize_mask(mask, (th, tw)).shape == (th, tw)


def test_task_sharding():
    items = list(range(103))
    parts = [task_slice(items, i, 4) for i in range(4)]
    assert sum(len(p) for p in parts) == 103
    assert [x for p in parts for x in p] == items
    assert detect_task(3, 8) == (3, 8)


def test_prompt_provider_caches(tmp_path):
    prov = FilePromptProvider(str(tmp_path), ImagePromptGenerator(seed=1))
    p1 = prov.get_prompts("red fox", 5)
    assert len(p1) == 5 and all("fox" in p for p in p1)
    p2 = prov.get_prompts("red fox", 3)
    assert p2 == p1[:3]  # cached


@pytest.fixture
def generated_dataset(tmp_path):
    cfg = GenerationConfig(
        output_dir=str(tmp_path / "raw"),
        prompts_dir=str(tmp_path / "prompts"),
        backend="procedural",
        prompts_per_class=2,
        seed=3,
    )
    pipe = ImageMaskGenerationPipeline(cfg, ProceduralBackend())
    n = pipe.process_class("tabby cat", 2)
    assert n == 2
    # resume: second run skips existing
    assert pipe.process_class("tabby cat", 2) == 2
    # reorganize into class layout
    root = tmp_path / "byclass" / "tabby_cat"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir(parents=True)
    import shutil

    for img in (tmp_path / "raw" / "images").glob("*.jpg"):
        sid = img.stem.rsplit("_", 1)[1]
        shutil.copy(img, root / "images" / f"{sid}.jpg")
        shutil.copy(
            tmp_path / "raw" / "masks" / f"{img.stem}.png",
            root / "masks" / f"{sid}.png",
        )
    return tmp_path / "byclass"


class _AlwaysPass(BaseFilter):
    def __init__(self):
        super().__init__("always_pass")

    def filter(self, sample):
        return FilterResult(passed=True, score=1.0)


class _RejectFirst(BaseFilter):
    def __init__(self):
        super().__init__("reject_first")
        self.n = 0

    def filter(self, sample):
        self.n += 1
        return FilterResult(passed=self.n > 1, reason="first sample rejected")


def test_filter_pipeline(generated_dataset, tmp_path):
    samples = DatasetLoader(str(generated_dataset)).load_samples()
    assert len(samples) == 2
    pipe = FilterPipeline(
        [_RejectFirst(), _AlwaysPass()],
        output_dir=str(tmp_path / "filtered"),
        failed_dir=str(tmp_path / "failed"),
    )
    stats = pipe.run(samples, progress=False)
    assert stats["kept"] == 1
    assert stats["rejected"] == {"reject_first": 1}
    assert len(list((tmp_path / "filtered" / "images").glob("*.jpg"))) == 1
    assert len(list((tmp_path / "failed" / "reject_first").glob("*.jpg"))) == 1
    # resume: already-done samples are skipped up front
    remaining = filter_unprocessed(samples, pipe.is_done)
    assert len(remaining) == 1


@pytest.mark.slow
def test_heuristic_vlm_filters(generated_dataset):
    from s3od_tpu.datagen.filters.vlm import (
        GemmaMaskArtifactFilter,
        GemmaSemanticFilter,
    )

    samples = DatasetLoader(str(generated_dataset)).load_samples()
    sem = GemmaSemanticFilter(model_id="/nonexistent")
    art = GemmaMaskArtifactFilter(model_id="/nonexistent")
    for s in samples:
        r1, r2 = sem.filter(s), art.filter(s)
        assert r1.metadata.get("heuristic") and r2.metadata.get("heuristic")
        assert r1.passed and r2.passed  # clean single blobs


def test_calculate_iou():
    a = np.zeros((10, 10)); a[:5] = 1
    b = np.zeros((10, 10)); b[:5] = 1
    assert calculate_iou(a, b) == 1.0
    assert calculate_iou(a, 1 - b) == 0.0
    assert calculate_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0


def test_mine_samples_allocation():
    from s3od_tpu.evaluation.mine_samples import (
        analyze_stability,
        calculate_new_samples,
    )

    scores = {"easy": 0.98, "mid": 0.9, "hard": 0.5}
    alloc = calculate_new_samples(scores, min_samples=10, max_samples=50)
    assert alloc["hard"] > alloc["mid"] > alloc["easy"]
    unstable, stable = analyze_stability(scores, n_categories=1)
    assert unstable == ["hard"] and stable == ["easy"]


def test_active_learning_loop_closure(tmp_path):
    """The paper's core loop (SURVEY §1: mine_samples difficulty scores ->
    per-class sample weights -> generation allocation, reference
    `mine_samples.py:79-113` + `generate_train_images.py:85-103`): a
    mining-results JSON written by `save_results` must drive per-class
    generation counts when handed to the orchestrator as
    `class_weights_file`."""
    from s3od_tpu.evaluation.mine_samples import (
        analyze_stability,
        calculate_new_samples,
        save_results,
    )
    from s3od_tpu.datagen.generate_train_images import (
        load_class_weights,
        make_backend,
    )

    scores = {"tabby cat": 0.98, "sea anemone": 0.55}
    alloc = calculate_new_samples(scores, min_samples=1, max_samples=3)
    assert alloc["sea anemone"] > alloc["tabby cat"]
    unstable, stable = analyze_stability(scores, n_categories=1)
    results = {
        "category_scores": scores,
        "new_samples": alloc,
        "category_sample_scores": {k: [v] for k, v in scores.items()},
        "stable_categories": stable,
        "unstable_categories": unstable,
    }
    json_path = save_results(results, str(tmp_path / "mining"), prefix="loop")

    class_list = tmp_path / "classes.json"
    class_list.write_text(json.dumps(["tabby cat", "sea anemone"]))
    cfg = GenerationConfig(
        output_dir=str(tmp_path / "gen"),
        prompts_dir=str(tmp_path / "prompts"),
        backend="procedural",
        class_list=str(class_list),
        class_weights_file=json_path,
        prompts_per_class=2,  # overridden per class by the mining weights
        seed=5,
    )
    assert load_class_weights(json_path, 2) == alloc
    pipe = ImageMaskGenerationPipeline(cfg, make_backend(cfg))
    total = pipe.run()
    assert total == sum(alloc.values())
    per_class = {
        c: len(list((tmp_path / "gen" / "images").glob(
            f"{c.replace(' ', '_')}_*.jpg")))
        for c in scores
    }
    assert per_class == alloc  # hard class got more samples than easy


@pytest.mark.slow
def test_flux_finetune_cli_end_to_end(tmp_path):
    """LoRA-finetune CLI orchestration (`datagen/flux_finetune.py`, reference
    `data_generation/flux_finetune/`): collect captioned samples, run
    rectified-flow LoRA steps on a tiny MMDiT + VAE, write the LoRA npz."""
    import jax
    import jax.numpy as jnp
    import yaml

    from s3od_tpu.convert import load_native, save_native
    from s3od_tpu.datagen.flux_finetune import collect_samples, run
    from s3od_tpu.models.mmdit import init_mmdit_params, tiny_mmdit_config
    from s3od_tpu.models.vae import VAE, init_vae_params, tiny_vae_config
    from PIL import Image

    # dataset: one 64px image + caption metadata in the reference layout
    ds_dir = tmp_path / "data" / "demo" / "images"
    ds_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    ).save(ds_dir / "a.png")
    meta_dir = tmp_path / "meta" / "demo"
    meta_dir.mkdir(parents=True)
    (meta_dir / "captions.json").write_text(json.dumps(
        [{"image_path": "a.png", "caption": "a red ball on grass"}]))

    samples = collect_samples(
        str(tmp_path / "data"), ["demo"], str(tmp_path / "meta"))
    assert len(samples) == 1
    assert samples[0]["caption"] == "a red ball on grass"

    mmdit_cfg = tiny_mmdit_config()
    save_native(str(tmp_path / "mmdit.npz"),
                init_mmdit_params(jax.random.key(0), mmdit_cfg))
    enc, dec = init_vae_params(jax.random.key(1), tiny_vae_config())
    vae = VAE(enc, dec, tiny_vae_config(), dtype=jnp.float32)

    class StubText:
        def encode(self, prompts):
            r = np.random.default_rng(len(prompts))
            return (r.standard_normal((len(prompts), 6, mmdit_cfg.text_dim))
                    .astype(np.float32),
                    r.standard_normal((len(prompts), mmdit_cfg.pooled_dim))
                    .astype(np.float32))

    class StubResizer:
        def resize_image(self, image):
            return image, image.shape[:2]

    cfg = {
        "flux_checkpoint": str(tmp_path / "mmdit.npz"),
        "input_dir": str(tmp_path / "data"),
        "datasets": ["demo"],
        "metadata_dir": str(tmp_path / "meta"),
        "rank": 2,
        "steps": 2,
        "out_lora": str(tmp_path / "lora.npz"),
    }
    cfg_path = tmp_path / "finetune.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    out = run(str(cfg_path), _mmdit_cfg=mmdit_cfg, _vae=vae,
              _text=StubText(), _resizer=StubResizer())
    lora, meta = load_native(out)
    leaves = jax.tree.leaves(lora)
    assert leaves and all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # merge scale persists next to the adapters so serving applies exactly
    # the trained W + (alpha/rank)·A@B (alpha defaults to 16, not rank)
    assert float(np.asarray(meta["alpha"])) == 16.0
    assert int(np.asarray(meta["rank"])) == 2

    # the pipeline's lora=path load must reproduce the trainer's merge
    from s3od_tpu.datagen.diffusion import ConceptAttentionPipeline
    from s3od_tpu.datagen.lora import LoRAConfig, merge_lora
    from s3od_tpu.models.mmdit import init_mmdit_params as reinit

    base = reinit(jax.random.key(0), mmdit_cfg)
    pipe = ConceptAttentionPipeline(base, mmdit_cfg, vae=vae, lora=out)
    expect = merge_lora(reinit(jax.random.key(0), mmdit_cfg), lora,
                        LoRAConfig(rank=2, alpha=16.0))
    for a, b in zip(jax.tree.leaves(pipe.params), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_metadata_sharded_tasks_do_not_clobber(tmp_path):
    """Sharded generate_metadata tasks write per-task shard files (a shared
    captions.json read-modify-written by N concurrent SLURM-array tasks
    keeps only the last writer's entries); load_metadata merges shards."""
    from PIL import Image

    from s3od_tpu.datagen.feature_extraction import load_metadata
    from s3od_tpu.datagen.generate_metadata import process_dataset

    ds = tmp_path / "in" / "demo"
    (ds / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        ).save(ds / "images" / f"im{i}.png")

    class StubGen:
        def caption(self, image, stem):
            return f"caption-{stem}"

        def tag(self, image, stem):
            return f"tag-{stem}"

    out = tmp_path / "out" / "demo"
    # two tasks over the same dataset, as a SLURM array would run them
    for tid in (0, 1):
        process_dataset(ds, out, StubGen(), tid, 2)

    files = sorted(p.name for p in out.glob("captions*.json"))
    assert len(files) == 2 and all(".task" in f for f in files)
    meta = load_metadata(str(tmp_path / "out"), "demo")
    assert len(meta) == 4  # nothing lost to the last writer
    for i in range(4):
        assert meta[f"im{i}"]["caption"] == f"caption-im{i}"
        assert meta[f"im{i}"]["tag"] == f"tag-im{i}"


def test_generation_config_diffusion_weight_fields(tmp_path):
    """The diffusion backend is constructible from config alone: the yaml
    carries the converted MMDiT/VAE/LoRA paths and the fsdp shard count
    (reference generation_config.yaml's model/lora paths)."""
    import yaml as _yaml

    from s3od_tpu.datagen.generate_train_images import GenerationConfig

    p = tmp_path / "gen.yaml"
    p.write_text(_yaml.safe_dump({
        "output_dir": "o", "prompts_dir": "p",
        "flux_checkpoint": "m.npz", "vae_checkpoint": "v.npz",
        "lora": "l.npz", "lora_scale": 8.0, "fsdp": -1,
    }))
    cfg = GenerationConfig.from_yaml(str(p))
    assert cfg.flux_checkpoint == "m.npz"
    assert cfg.vae_checkpoint == "v.npz"
    assert cfg.lora == "l.npz" and cfg.lora_scale == 8.0
    assert cfg.fsdp == -1
