"""Serving frontend: dynamic batching, bucket padding, option
grouping, error propagation, and parity with a direct
``generate_reports_batch`` call.  (Net-new capability — the reference
has no serving layer, SURVEY.md §0.1.)"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_tpu.models.experts import create_model
from radar_tpu.models.decoder import ReportDecoder
from radar_tpu.pipeline.radar import RadarPipeline
from radar_tpu.serving.server import RadarServer, ServerConfig


@pytest.fixture(scope="module")
def pipeline(cfg, dataset, tokenizer):
    expert = create_model("baseline", cfg.vision, cfg.text, cfg.expert)
    s = dataset[0]
    expert_params = expert.init(
        jax.random.key(0), jnp.asarray(s["pixel_values"])[None],
        jnp.asarray(s["input_ids"])[None],
        jnp.asarray(s["attention_mask"])[None])["params"]
    decoder = ReportDecoder(cfg.decoder)
    decoder_params = decoder.init(
        jax.random.key(1), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, cfg.decoder.prefix_dim), jnp.float32))["params"]
    return RadarPipeline(cfg, tokenizer, expert, expert_params,
                         None, decoder, decoder_params)


def _studies(dataset, n):
    return ([dataset[i]["pixel_values"] for i in range(n)],
            [dataset[i]["clinical_context"] for i in range(n)])


def test_bucket_resolution():
    assert ServerConfig(max_batch_size=16).resolved_buckets() == \
        (1, 2, 4, 8, 16)
    assert ServerConfig(max_batch_size=6).resolved_buckets() == \
        (1, 2, 4, 6)
    assert ServerConfig(max_batch_size=8,
                        buckets=(4, 2)).resolved_buckets() == (2, 4, 8)


def test_bucket_multiple_rounds_up():
    cfg = ServerConfig(max_batch_size=16, batch_multiple=4)
    assert cfg.resolved_buckets() == (4, 8, 16)
    cfg = ServerConfig(max_batch_size=6, batch_multiple=4)
    assert cfg.resolved_buckets() == (4, 8)
    cfg = ServerConfig(max_batch_size=8, buckets=(2, 5),
                       batch_multiple=4)
    assert cfg.resolved_buckets() == (4, 8)


def test_effective_cap_fills_rounded_bucket(pipeline):
    """When batch_multiple rounds the largest bucket above
    max_batch_size, the batcher pops up to the BUCKET so saturated
    batches carry real work, not permanent padding."""
    server = RadarServer(pipeline, ServerConfig(
        max_batch_size=6, batch_multiple=4, max_wait_ms=0.0))
    try:
        assert server.config.resolved_buckets() == (4, 8)
        assert server._max_take == 8
    finally:
        server.shutdown()


def test_dp_serving_parity(pipeline, cfg, tokenizer, dataset):
    """Data-parallel serving (params replicated over a mesh, batches
    sharded on the data axis) must produce the single-device pipeline's
    exact greedy outputs — including for a batch size that does NOT
    divide the mesh (internal padding).  Net-new vs the reference
    (single-GPU torch serving); the TPU scale-out story for serving."""
    from jax.sharding import Mesh, PartitionSpec

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.asarray(devs[:4]), ("data",))
    pipe_dp = RadarPipeline(
        cfg, tokenizer, pipeline.expert_model, pipeline.expert_params,
        None, pipeline.decoder, pipeline.decoder_params,
        serving_mesh=(mesh, "data"))

    # params really replicated over all 4 devices
    leaf = jax.tree_util.tree_leaves(pipe_dp.decoder_params)[0]
    assert len(leaf.sharding.device_set) == 4
    # batches really sharded along the data axis
    arr = pipe_dp._put_batch(np.zeros((4, 8), np.float32))
    assert arr.sharding.spec == PartitionSpec("data")

    images, contexts = _studies(dataset, 3)   # 3 % 4 != 0 → padding
    direct = pipeline.generate_reports_batch(images, contexts)
    dp = pipe_dp.generate_reports_batch(images, contexts)
    assert len(dp) == 3
    for d, r in zip(direct, dp):
        assert r["report"] == d["report"]
        # same decisions; probabilities may differ in the last ulps
        # (batch-3 program vs the padded batch-4 SPMD program)
        assert set(r["expert_observations"]) == \
            set(d["expert_observations"])
        for k, v in r["expert_observations"].items():
            assert v == pytest.approx(d["expert_observations"][k],
                                      abs=1e-5)


def test_dp_serving_rejects_ring():
    from jax.sharding import Mesh

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs[:2]), ("data",))
    with pytest.raises(ValueError, match="serving_mesh and ring"):
        RadarPipeline(None, None, ring=(mesh, "data"),
                      serving_mesh=(mesh, "data"))


def test_parity_with_direct_batch(pipeline, dataset):
    """A full bucket served through the server must produce exactly
    the direct ``generate_reports_batch`` outputs (same shapes → same
    XLA program → bitwise-identical greedy decode)."""
    images, contexts = _studies(dataset, 4)
    direct = pipeline.generate_reports_batch(images, contexts)

    server = RadarServer(pipeline, ServerConfig(
        max_batch_size=4, max_wait_ms=200.0))
    futs = [server.submit(img, ctx)
            for img, ctx in zip(images, contexts)]
    results = [f.result(timeout=120) for f in futs]
    server.shutdown()

    for d, r in zip(direct, results):
        assert r["report"] == d["report"]
        assert r["expert_observations"] == d["expert_observations"]
        assert r["serving"]["batch_size"] == 4
        assert r["serving"]["bucket"] == 4
        assert r["serving"]["latency_s"] > 0


def test_coalescing_and_stats(pipeline, dataset):
    """Concurrent submissions inside the wait window coalesce into one
    batch; stats must reflect it."""
    images, contexts = _studies(dataset, 3)
    server = RadarServer(pipeline, ServerConfig(
        max_batch_size=4, max_wait_ms=300.0))
    futs = []

    def submit(i):
        futs.append(server.submit(images[i], contexts[i]))

    threads = [threading.Thread(target=submit, args=(i,))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for f in list(futs):
        assert isinstance(f.result(timeout=120)["report"], str)
    stats = server.stats()
    server.shutdown()
    assert stats["requests_served"] == 3
    # all three landed within one 300 ms window on this host → one
    # batch of 3 padded to bucket 4; allow a 2-batch split under
    # extreme scheduler jitter
    assert stats["batches"] <= 2
    assert stats["mean_batch_size"] >= 1.5
    if stats["batches"] == 1:
        assert stats["padded_row_fraction"] == pytest.approx(0.25)
    assert stats["latency_p50_s"] > 0
    assert stats["reports_per_sec"] > 0


def test_option_groups_never_share_a_batch(pipeline, dataset):
    """grounding-on and grounding-off requests trigger different XLA
    programs and must be served in separate batches."""
    images, contexts = _studies(dataset, 4)
    server = RadarServer(pipeline, ServerConfig(
        max_batch_size=4, max_wait_ms=250.0))
    futs = [server.submit(images[i], contexts[i],
                          verify_grounding=(i % 2 == 1))
            for i in range(4)]
    results = [f.result(timeout=240) for f in futs]
    server.shutdown()
    plain = {r["serving"]["batch_size"] for i, r in enumerate(results)
             if i % 2 == 0}
    grounded = [r for i, r in enumerate(results) if i % 2 == 1]
    assert plain == {2}
    for r in grounded:
        assert r["serving"]["batch_size"] == 2
        assert "grounding" in r       # the grounded program really ran


def test_error_propagates_to_futures(pipeline, dataset):
    """A poisoned study fails its batch; the futures get the exception
    and the server keeps serving afterwards."""
    images, contexts = _studies(dataset, 1)
    server = RadarServer(pipeline, ServerConfig(
        max_batch_size=2, max_wait_ms=50.0))
    bad = server.submit(np.zeros((3, 3), np.float32), "bad shape")
    with pytest.raises(Exception):
        bad.result(timeout=120)
    ok = server.submit(images[0], contexts[0])
    assert isinstance(ok.result(timeout=120)["report"], str)
    server.shutdown()


def test_shutdown_drains_and_rejects(pipeline, dataset):
    images, contexts = _studies(dataset, 2)
    server = RadarServer(pipeline, ServerConfig(
        max_batch_size=2, max_wait_ms=10.0))
    futs = [server.submit(img, ctx)
            for img, ctx in zip(images, contexts)]
    server.shutdown(wait=True)
    for f in futs:
        assert isinstance(f.result(timeout=1)["report"], str)
    with pytest.raises(RuntimeError):
        server.submit(images[0], contexts[0])


def test_bench_async_serving_cli(tmp_path):
    """The Poisson-arrival bench runs end-to-end on the tiny synthetic
    config and writes a per-load latency artifact."""
    from radar_tpu.cli.bench_async_serving import main
    r = main(["--synthetic", "--tiny", "--synthetic_size", "32",
              "--serve_batch", "4", "--offered_load", "50",
              "--requests_per_load", "8", "--max_wait_ms", "30",
              "--retrieval_checkpoint", str(tmp_path / "none"),
              "--output", str(tmp_path / "async.json")])
    assert r["measured"] and len(r["loads"]) == 1
    row = r["loads"][0]
    assert row["latency_p50_s"] > 0
    assert row["achieved_rps"] > 0
    assert 1 <= row["mean_batch_size"] <= 4
    # warmup rows (2 passes over buckets 4+2+1) are excluded from the
    # aggregate stats by reset_stats(); only the measured load remains
    assert r["server_stats"]["requests_served"] == 8
    assert r["warmup_seconds"] > 0


def test_http_endpoint(pipeline, dataset):
    """HTTP front door: concurrent POSTs batch through the server;
    bad requests get 400s; /stats and /healthz respond."""
    import base64
    import json as _json
    import urllib.request
    import urllib.error
    from concurrent.futures import ThreadPoolExecutor

    from radar_tpu.serving.http import RadarHTTPServer

    images, contexts = _studies(dataset, 2)
    server = RadarServer(pipeline, ServerConfig(
        max_batch_size=2, max_wait_ms=200.0))
    http = RadarHTTPServer(server)
    base = f"http://{http.host}:{http.port}"

    def post(path, payload):
        req = urllib.request.Request(
            f"{base}{path}", data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as r:
            return r.status, _json.loads(r.read())

    def body(i):
        img = np.asarray(images[i], np.float32)
        return {"image": {"b64": base64.b64encode(
                              img.astype("<f4").tobytes()).decode(),
                          "shape": list(img.shape)},
                "clinical_context": contexts[i]}

    try:
        with ThreadPoolExecutor(2) as ex:
            rs = list(ex.map(lambda i: post("/generate", body(i)),
                             range(2)))
        for status, out in rs:
            assert status == 200
            assert isinstance(out["report"], str)
            assert out["serving"]["batch_size"] >= 1

        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert r.status == 200
        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = _json.loads(r.read())
        assert stats["requests_served"] >= 2

        # malformed: wrong payload size for the declared shape
        try:
            post("/generate", {"image": {"b64": "AAAA", "shape": [4, 4, 3]},
                               "clinical_context": "x"})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # malformed: missing clinical_context
        try:
            post("/generate", {"image": {"data": [[0.0]]}})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        http.close()
        server.shutdown()
    # after shutdown the HTTP layer is closed too; server rejects
    with pytest.raises(RuntimeError):
        server.submit(images[0], contexts[0])


def test_serve_cli_start(tmp_path):
    """cli.serve boots pipeline + batcher + HTTP from flags; /healthz
    and a real /generate round-trip respond."""
    import base64
    import json as _json
    import urllib.request

    from radar_tpu.cli.serve import start

    http, server = start([
        "--synthetic", "--tiny", "--synthetic_size", "32",
        "--passages", "16", "--serve_batch", "2", "--port", "0",
        "--retrieval_checkpoint", str(tmp_path / "none")])
    try:
        base = f"http://{http.host}:{http.port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert r.status == 200
        from radar_tpu.core.config import tiny_config
        size = tiny_config().vision.image_size
        img = np.zeros((size, size, 3), np.float32)
        body = _json.dumps({
            "image": {"b64": base64.b64encode(
                img.astype("<f4").tobytes()).decode(),
                "shape": [size, size, 3]},
            "clinical_context": "Indication: cough."}).encode()
        req = urllib.request.Request(
            f"{base}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as r:
            out = _json.loads(r.read())
        assert isinstance(out["report"], str)
    finally:
        http.close()
        server.shutdown()


def test_backpressure_queue_full(pipeline, dataset):
    """Bounded queue sheds load with QueueFull once at capacity; the
    queued requests still complete and the rejection is counted."""
    from radar_tpu.serving.server import QueueFull

    images, contexts = _studies(dataset, 1)
    server = RadarServer(pipeline, ServerConfig(
        max_batch_size=1, max_wait_ms=0.0, max_queue=2))
    # hold the batcher's attention with a first request, then fill the
    # queue behind it
    futs = [server.submit(images[0], contexts[0])]
    rejected = 0
    for _ in range(12):
        try:
            futs.append(server.submit(images[0], contexts[0]))
        except QueueFull:
            rejected += 1
    assert rejected >= 1            # the queue really is bounded
    for f in futs:
        assert isinstance(f.result(timeout=300)["report"], str)
    stats = server.stats()
    server.shutdown()
    assert stats["requests_rejected"] == rejected
    assert stats["requests_served"] == len(futs)


def test_bench_admission_control_sheds(tmp_path):
    """With a bounded queue, overload is shed at submit (QueueFull) and
    reported as shed_fraction; admitted requests all complete (round-4
    verdict item 6: overload must degrade throughput, not explode
    p95)."""
    from radar_tpu.cli.bench_async_serving import main
    r = main(["--synthetic", "--tiny", "--synthetic_size", "32",
              "--serve_batch", "2", "--offered_load", "500",
              "--requests_per_load", "32", "--max_wait_ms", "0",
              "--max_queue", "2",
              "--retrieval_checkpoint", str(tmp_path / "none"),
              "--output", str(tmp_path / "async.json")])
    row = r["loads"][0]
    assert r["max_queue"] == 2
    assert 0.0 <= row["shed_fraction"] < 1.0
    # every admitted request completed
    admitted = round((1 - row["shed_fraction"]) * 32)
    assert r["server_stats"]["requests_served"] >= admitted


def test_wire_dtype_never_shares_a_batch():
    from radar_tpu.serving.server import _Request
    img8 = np.zeros((8, 8, 3), np.uint8)
    imgf = np.zeros((8, 8, 3), np.float32)
    a = _Request(img8, "c", None, None, False)
    b = _Request(imgf, "c", None, None, False)
    assert a.options_key() != b.options_key()


def test_http_uint8_image_decode():
    import base64
    from radar_tpu.serving.http import _decode_image
    raw = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    spec = {"b64": base64.b64encode(raw.tobytes()).decode(),
            "shape": [2, 2, 3], "dtype": "uint8"}
    out = _decode_image(spec)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, raw)
    import pytest
    with pytest.raises(ValueError, match="dtype"):
        _decode_image({"b64": "AA==", "shape": [1], "dtype": "int64"})


def test_uint8_wire_matches_host_normalization(pipeline):
    """uint8 upload + on-device fused preprocessing must reproduce the
    host normalization path to within u8 quantization error — the wire
    format cannot change model inputs."""
    import jax.numpy as jnp
    from radar_tpu.data.dataset import IMAGE_MEAN, IMAGE_STD
    rng = np.random.default_rng(0)
    size = pipeline.config.vision.image_size
    raw = rng.integers(0, 256, (3, size, size, 3)).astype(np.uint8)
    host = ((raw.astype(np.float32) / 255.0
             - np.asarray(IMAGE_MEAN, np.float32))
            / np.asarray(IMAGE_STD, np.float32))
    dev = np.asarray(pipeline._preprocess_batch(list(raw)))
    np.testing.assert_allclose(dev, host, atol=1e-5)
    # float32 input passes through untouched
    passthru = np.asarray(pipeline._preprocess_batch(list(host)))
    np.testing.assert_allclose(passthru, host, atol=1e-6)


def test_uint8_requests_end_to_end(pipeline, dataset):
    """uint8-wire requests batch through the server and produce
    reports; mixed-dtype submissions are served in separate batches
    (never mis-normalized together)."""
    from radar_tpu.data.dataset import IMAGE_MEAN, IMAGE_STD
    images, contexts = _studies(dataset, 4)
    raws = [np.clip((np.asarray(im, np.float32)
                     * np.asarray(IMAGE_STD, np.float32)
                     + np.asarray(IMAGE_MEAN, np.float32)) * 255.0,
                    0, 255).astype(np.uint8) for im in images]
    server = RadarServer(pipeline, ServerConfig(
        max_batch_size=4, max_wait_ms=200.0))
    futs = [server.submit(raw, ctx)
            for raw, ctx in zip(raws[:2], contexts[:2])]
    futs += [server.submit(img, ctx)
             for img, ctx in zip(images[2:], contexts[2:])]
    results = [f.result(timeout=300) for f in futs]
    server.shutdown()
    assert all(r["report"] for r in results)
    # u8 and f32 submissions must not have shared a batch
    assert all(r["serving"]["batch_size"] == 2 for r in results)


def test_warmup_compiles_buckets_and_reset_stats(pipeline, dataset):
    """warmup() exercises every bucket through the real submit path
    (largest first), and reset_stats() zeroes the distributions so the
    aggregate stats a deployment reports reflect traffic only — not
    the 20-40 s first-use compiles (round-4: 127 warmup rows drove the
    aggregate p95 to 71 s)."""
    images, contexts = _studies(dataset, 1)
    server = RadarServer(pipeline, ServerConfig(
        max_batch_size=4, max_wait_ms=0.0))
    dt = server.warmup(images[0], contexts[0], repeats=2)
    assert dt > 0
    stats = server.stats()
    # 2 passes over buckets (1, 2, 4) = 14 rows
    assert stats["requests_served"] == 14
    server.reset_stats()
    stats = server.stats()
    assert stats["requests_served"] == 0
    assert stats["batches"] == 0
    assert stats["latency_p50_s"] == 0.0
    # the server still serves normally after a reset
    fut = server.submit(images[0], contexts[0])
    assert isinstance(fut.result(timeout=120)["report"], str)
    assert server.stats()["requests_served"] == 1
    server.shutdown()
