"""Dynamic-batching inference server (esm_tpu/runtime/server.py): response
numerics must match a direct model call, concurrent requests must coalesce
into shared device batches, and malformed requests must fail cleanly."""

import json
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2
from esm_tpu.pretrained import LMHandle
from esm_tpu.runtime.server import InferenceServer

SEQS = [
    "MKTVRQERLKSIVRILERSKEPVSGAQLAEELSVSRQVIVQDIAYLRSLGYNIVATPRGYVLA",
    "KALTARQQEVFDLIRDHISQTGMPPTRAEIA",
    "QEVFDLIRD",
]


@pytest.fixture(scope="module")
def server():
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=32, attention_heads=2
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    model = LMHandle("esm2", cfg, params, alphabet)
    srv = InferenceServer(model, max_wait_ms=150.0, truncation_seq_length=60).start()
    yield srv, model
    srv.stop()


def _post(srv, payload, path="/embed"):
    req = urllib.request.Request(
        srv.url + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def _get(srv, path):
    with urllib.request.urlopen(srv.url + path, timeout=30) as resp:
        return json.loads(resp.read())


def test_healthz(server):
    srv, _ = server
    h = _get(srv, "/healthz")
    assert h["status"] == "ok" and h["model_kind"] == "esm2" and h["num_layers"] == 2


def test_embed_matches_direct_call(server):
    srv, model = server
    out = _post(srv, {
        "sequences": [["a", SEQS[0]], ["b", SEQS[1]]],
        "repr_layers": [0, -1],
        "include": ["mean", "per_tok", "logits", "contacts"],
    })
    results = out["results"]
    assert [r["label"] for r in results] == ["a", "b"]

    _, _, toks = model.alphabet.get_batch_converter(60)(
        [("a", SEQS[0]), ("b", SEQS[1])]
    )
    direct = model(toks, repr_layers=[0, 2], return_contacts=True)
    for i, (r, seq) in enumerate(zip(results, SEQS[:2])):
        L = min(len(seq), 60)
        assert r["length"] == L and r["truncated"] == (len(seq) > 60)
        rep = np.asarray(direct["representations"][2])[i, 1 : L + 1]
        np.testing.assert_allclose(
            np.asarray(r["representations"]["2"]), rep, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(r["mean_representations"]["2"]), rep.mean(0), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(r["logits"]),
            np.asarray(direct["logits"])[i, 1 : L + 1],
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(r["contacts"]),
            np.asarray(direct["contacts"])[i, :L, :L],
            atol=1e-5,
        )


def test_concurrent_requests_are_batched(server):
    srv, _ = server
    before = _get(srv, "/stats")
    n = 6
    results = [None] * n
    barrier = threading.Barrier(n)

    def worker(j):
        barrier.wait()
        results[j] = _post(srv, {"sequences": [SEQS[j % 3]], "include": ["mean"]})

    threads = [threading.Thread(target=worker, args=(j,)) for j in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and len(r["results"]) == 1 for r in results)
    # identical sequences must produce identical embeddings across batches
    a = results[0]["results"][0]["mean_representations"]
    b = results[3]["results"][0]["mean_representations"]
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), atol=1e-5)

    after = _get(srv, "/stats")
    new_reqs = after["requests"] - before["requests"]
    new_batches = after["batches"] - before["batches"]
    assert new_reqs == n
    assert new_batches < new_reqs, (before, after)  # coalescing happened


def test_oversized_request_is_sliced(server):
    """A single request above max_batch_seqs (16) must be served in multiple
    device batches, never one giant padded batch."""
    srv, model = server
    before = _get(srv, "/stats")
    seqs = [SEQS[j % 3][: 5 + j % 7] for j in range(20)]
    out = _post(srv, {"sequences": seqs, "include": ["mean"]})
    assert len(out["results"]) == 20
    after = _get(srv, "/stats")
    assert after["batches"] - before["batches"] >= 2
    # order preserved and numerics independent of slicing
    _, _, toks = model.alphabet.get_batch_converter(60)([("x", seqs[-1])])
    rep = np.asarray(model(toks, repr_layers=[2])["representations"][2])
    expect = rep[0, 1 : len(seqs[-1]) + 1].mean(0)
    np.testing.assert_allclose(
        np.asarray(out["results"][-1]["mean_representations"]["2"]),
        expect, atol=1e-5,
    )


def test_bad_requests(server):
    srv, _ = server
    for payload, frag in [
        ({"sequences": []}, "non-empty"),
        ({"sequences": ["MK1TA"]}, "unknown residue"),
        ({"sequences": [""]}, "empty sequence"),
        ({"sequences": ["MKT"], "include": ["bogus"]}, "bogus"),
        ({"sequences": ["MKT"], "repr_layers": [99]}, "out of range"),
        ({"sequences": "MKT"}, "non-empty list"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(srv, payload)
        assert exc_info.value.code == 400
        body = json.loads(exc_info.value.read())
        assert frag in body["error"], (payload, body)

    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(srv, {"sequences": ["MKT"]}, path="/nope")
    assert exc_info.value.code == 404


def test_admission_control_429(server):
    """Past max_queued_seqs the server rejects with 429 + Retry-After instead
    of queueing without bound; once the backlog drains, requests are admitted
    again and stats expose the rejection."""
    _, model = server
    srv = InferenceServer(
        model,
        max_wait_ms=2000.0,  # hold the first request in the batch window
        truncation_seq_length=60,
        max_queued_seqs=2,
    ).start()
    try:
        results = {}

        def post_a():
            results["a"] = _post(srv, {"sequences": SEQS[:2]})

        t = threading.Thread(target=post_a)
        t.start()
        # wait until request A is admitted (occupies the whole budget)
        for _ in range(100):
            if _get(srv, "/stats")["inflight_sequences"] == 2:
                break
            import time

            time.sleep(0.02)
        else:
            pytest.fail("request A never became in-flight")

        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(srv, {"sequences": SEQS[2:3]})
        assert exc_info.value.code == 429
        assert int(exc_info.value.headers["Retry-After"]) >= 1
        body = json.loads(exc_info.value.read())
        assert "saturated" in body["error"]

        t.join(timeout=120)
        assert "results" in results["a"]
        # backlog drained -> admitted again
        ok = _post(srv, {"sequences": SEQS[2:3]})
        assert "results" in ok

        stats = _get(srv, "/stats")
        assert stats["rejected"] >= 1
        assert stats["inflight_sequences"] == 0
        assert stats["max_queued_seqs"] == 2
    finally:
        srv.stop()


def test_unadmittable_request_is_permanent_400(server):
    """A request larger than max_queued_seqs can NEVER be admitted — it must
    fail with a permanent 400 ("split the request"), not a 429 the client
    would retry forever."""
    _, model = server
    srv = InferenceServer(
        model, truncation_seq_length=60, max_queued_seqs=2
    ).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(srv, {"sequences": SEQS[:3]})
        assert exc_info.value.code == 400
        body = json.loads(exc_info.value.read())
        assert "split the request" in body["error"]
        assert "Retry-After" not in (exc_info.value.headers or {})
        # the server is still healthy and admits a right-sized request
        ok = _post(srv, {"sequences": SEQS[:2]})
        assert "results" in ok
    finally:
        srv.stop()


def test_npz_format_matches_json(server):
    """format='npz' returns one binary .npz whose arrays equal the JSON
    response's values and whose payload is much smaller."""
    import io

    srv, model = server
    payload = {
        "sequences": [["a", SEQS[0]], ["b", SEQS[1]]],
        "repr_layers": [-1],
        "include": ["mean", "per_tok", "contacts"],
    }
    js = _post(srv, payload)["results"]

    req = urllib.request.Request(
        srv.url + "/embed",
        data=json.dumps({**payload, "format": "npz"}).encode(),
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers["Content-Type"] == "application/octet-stream"
        body = resp.read()
    assert len(body) < len(json.dumps(js)) / 2  # binary beats decimal text
    # (2.6x at these toy dims; the gap grows with embed_dim/length)
    npz = np.load(io.BytesIO(body))
    assert list(npz["labels"]) == ["a", "b"]
    for i, r in enumerate(js):
        np.testing.assert_allclose(
            npz[f"{i}/mean/2"], np.asarray(r["mean_representations"]["2"]), atol=1e-6
        )
        np.testing.assert_allclose(
            npz[f"{i}/per_tok/2"], np.asarray(r["representations"]["2"]), atol=1e-6
        )
        np.testing.assert_allclose(
            npz[f"{i}/contacts"], np.asarray(r["contacts"]), atol=1e-6
        )
        assert npz["lengths"][i] == r["length"]

    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(srv, {**payload, "format": "parquet"})
    assert exc_info.value.code == 400


@pytest.mark.slow
def test_mixed_endpoint_soak(server):
    """Randomized concurrent mix of /embed (json+npz), /score, bad requests,
    and /stats polls: every well-formed request succeeds, every malformed one
    fails with 400, and the server stays consistent (no 500s, no hangs)."""
    import io
    import random

    srv, _ = server
    errors = []

    def client(j):
        rng = random.Random(j)
        for _ in range(6):
            kind = rng.random()
            try:
                if kind < 0.4:
                    out = _post(srv, {
                        "sequences": [SEQS[rng.randrange(3)]],
                        "include": rng.choice([["mean"], ["mean", "logits"]]),
                    })
                    assert out["results"][0]["length"] > 0
                elif kind < 0.55:
                    req = urllib.request.Request(
                        srv.url + "/embed",
                        data=json.dumps({
                            "sequences": [SEQS[rng.randrange(3)]],
                            "include": ["mean"], "format": "npz",
                        }).encode(),
                    )
                    with urllib.request.urlopen(req, timeout=120) as resp:
                        npz = np.load(io.BytesIO(resp.read()))
                    assert npz["lengths"][0] > 0
                elif kind < 0.7:
                    out = _post(srv, {
                        "sequence": SEQS[1], "mutations": ["K1A"], "offset_idx": 1,
                    }, path="/score")
                    assert "K1A" in out["results"][0]["scores"]
                elif kind < 0.85:
                    try:
                        _post(srv, {"sequences": ["MK1"]})
                        errors.append("bad request did not 400")
                    except urllib.error.HTTPError as e:
                        assert e.code == 400
                        e.read()
                else:
                    _get(srv, "/stats")
            except Exception as e:  # noqa: BLE001
                errors.append(f"client {j}: {type(e).__name__}: {e}")

    threads = [threading.Thread(target=client, args=(j,)) for j in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    stats = _get(srv, "/stats")
    assert stats["errors"] >= 1  # the 400s were counted
    assert stats["requests"] >= 20


@pytest.mark.slow
def test_profile_endpoint(server, tmp_path):
    """/profile captures a jax.profiler trace of concurrent batcher work."""
    srv, _ = server
    trace_dir = str(tmp_path / "trace")
    worker = threading.Thread(
        target=lambda: _post(srv, {"sequences": [SEQS[0]], "include": ["mean"]})
    )
    worker.start()
    out = _post(srv, {"seconds": 0.5, "dir": trace_dir}, path="/profile")
    worker.join()
    assert out["trace_dir"] == trace_dir
    import pathlib as _pl

    assert any(_pl.Path(trace_dir).rglob("*")), "empty trace dir"

    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(srv, {"seconds": 0}, path="/profile")
    assert exc_info.value.code == 400


def test_npz_and_json_with_bf16_model():
    """With bf16 compute (the documented TPU serving default) npz arrays must
    come back as readable float32 — np.savez writes raw bfloat16 as opaque
    void bytes — and the JSON path must emit plain floats."""
    import io

    import jax.numpy as jnp

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=32, attention_heads=2,
        compute_dtype=jnp.bfloat16,
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    model = LMHandle("esm2", cfg, params, alphabet)
    srv = InferenceServer(model, max_wait_ms=30.0, truncation_seq_length=60).start()
    try:
        payload = {
            "sequences": [SEQS[2]],
            "include": ["mean", "per_tok"],
            "format": "npz",
        }
        req = urllib.request.Request(
            srv.url + "/embed", data=json.dumps(payload).encode()
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            npz = np.load(io.BytesIO(resp.read()))
        assert npz["0/per_tok/2"].dtype == np.float32
        assert npz["0/mean/2"].dtype == np.float32
        assert np.isfinite(npz["0/per_tok/2"]).all()

        js = _post(srv, {**payload, "format": "json"})["results"][0]
        per_tok = np.asarray(js["representations"]["2"], np.float32)
        np.testing.assert_allclose(per_tok, npz["0/per_tok/2"], atol=1e-6)
    finally:
        srv.stop()


def test_score_endpoint_matches_wt_marginals(server):
    """/score == the variant CLI's wt-marginals math (reference
    predict.py:107-115): logp[mt] - logp[wt] at the mutated position from one
    wild-type forward."""
    srv, model = server
    seq = SEQS[1]  # "KALTARQQEVFDLIRDHISQTGMPPTRAEIA"
    out = _post(srv, {
        "sequence": seq,
        "mutations": ["K1A", "T4W", "A31G"],
        "offset_idx": 1,
        "label": "wt",
    }, path="/score")
    r = out["results"][0]
    assert r["label"] == "wt" and r["strategy"] == "wt-marginals"
    assert set(r["scores"]) == {"K1A", "T4W", "A31G"}

    import jax

    from esm_tpu.cli.predict_variants import label_row

    _, _, toks = model.alphabet.get_batch_converter(60)([("wt", seq)])
    token_probs = np.asarray(jax.nn.log_softmax(model(toks)["logits"], axis=-1))
    for raw in ("K1A", "T4W", "A31G"):
        expect = label_row(raw, seq, token_probs, model.alphabet, 1)
        assert np.isclose(r["scores"][raw], expect, atol=1e-4), raw

    # validation paths
    for payload, frag in [
        ({"sequence": seq, "mutations": ["Q1A"], "offset_idx": 1}, "does not match"),
        ({"sequence": seq, "mutations": ["K99A"], "offset_idx": 1}, "out of range"),
        ({"sequence": seq, "mutations": ["bogus"]}, "expected e.g."),
        ({"sequence": seq, "mutations": []}, "non-empty list"),
        ({"sequence": "X" * 100, "mutations": ["X1A"], "offset_idx": 1}, "truncation"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(srv, payload, path="/score")
        assert exc_info.value.code == 400
        assert frag in json.loads(exc_info.value.read())["error"], payload


def test_batch_bucket_max_outputs_unchanged():
    """batch_bucket='max' (pad multi-request batches to max_batch) must not
    change any response numerics vs the default pow2 bucketing."""
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=32, attention_heads=2
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    model = LMHandle("esm2", cfg, params, alphabet)
    srv = InferenceServer(
        model, max_wait_ms=30.0, truncation_seq_length=60,
        max_batch_seqs=8, batch_bucket="max",
    ).start()
    try:
        out = _post(srv, {
            "sequences": [["a", SEQS[0]], ["b", SEQS[1]], ["c", SEQS[2]]],
            "include": ["mean", "logits"],
        })
        _, _, toks = model.alphabet.get_batch_converter(60)(
            [("a", SEQS[0]), ("b", SEQS[1]), ("c", SEQS[2])]
        )
        direct = model(toks, repr_layers=[2])
        for i, (r, seq) in enumerate(zip(out["results"], SEQS)):
            L = min(len(seq), 60)
            np.testing.assert_allclose(
                np.asarray(r["logits"]),
                np.asarray(direct["logits"])[i, 1 : L + 1],
                atol=1e-5,
            )
    finally:
        srv.stop()

    with pytest.raises(ValueError, match="batch_bucket"):
        InferenceServer(model, batch_bucket="nope")


@pytest.mark.slow
def test_serve_cli_starts_from_checkpoint(tmp_path, monkeypatch):
    """esm-serve CLI path: load a (synthesized) checkpoint by location, apply
    --int8/--max-batch flags, serve /healthz and /embed."""
    from tests.test_fold_cli import _make_cache

    cache, _ = _make_cache(tmp_path)
    monkeypatch.setenv("ESM_TPU_CACHE", str(cache))

    from esm_tpu.cli import serve

    args = serve.create_parser().parse_args(
        [str(cache / "esm2_t6_8M_UR50D_500K.pt"), "--port", "0",
         "--max-batch", "4", "--max-wait-ms", "50", "--int8",
         "--truncation-seq-length", "60"]
    )
    srv = serve.start_server(args)
    try:
        h = _get(srv, "/healthz")
        assert h["status"] == "ok" and h["num_layers"] == 2
        out = _post(srv, {"sequences": ["MKTVRQERLK"], "include": ["mean", "logits"]})
        r = out["results"][0]
        assert r["length"] == 10 and len(r["logits"]) == 10
        assert np.isfinite(np.asarray(r["mean_representations"]["2"])).all()
    finally:
        srv.stop()

    # LM + fold model via CLI flags
    args = serve.create_parser().parse_args(
        [str(cache / "esm2_t6_8M_UR50D_500K.pt"), "--port", "0",
         "--fold-model", str(cache / "esmfold_tiny.pt"),
         "--fold-chunk-size", "32", "--max-fold-batch", "2",
         "--truncation-seq-length", "60"]
    )
    srv = serve.start_server(args)
    try:
        h = _get(srv, "/healthz")
        assert h["endpoints"] == ["/embed", "/score", "/fold"]
        assert srv.fold_model.cfg.trunk.chunk_size == 32
        out = _post(srv, {"sequences": ["MKTVRQ"], "num_recycles": 0}, path="/fold")
        assert out["results"][0]["pdb"].startswith("ATOM")
    finally:
        srv.stop()


def test_msa_model_rejected():
    alphabet = Alphabet.from_architecture("msa_transformer")
    fake = type("H", (), {"kind": "msa", "alphabet": alphabet})()
    with pytest.raises(ValueError, match="single-sequence"):
        InferenceServer(fake)
    with pytest.raises(ValueError, match="at least one"):
        InferenceServer()


@pytest.fixture(scope="module")
def fold_server(tmp_path_factory, monkeypatch_module):
    from tests.test_fold_cli import _make_cache

    tmp_path = tmp_path_factory.mktemp("fold_srv")
    cache, fold_path = _make_cache(tmp_path)
    monkeypatch_module.setenv("ESM_TPU_CACHE", str(cache))

    from esm_tpu import pretrained

    handle = pretrained.load_esmfold(str(fold_path))
    srv = InferenceServer(
        fold_model=handle, max_wait_ms=100.0, max_fold_batch_seqs=2
    ).start()
    yield srv, handle
    srv.stop()


@pytest.fixture(scope="module")
def monkeypatch_module():
    mp = pytest.MonkeyPatch()
    yield mp
    mp.undo()


@pytest.mark.slow
def test_fold_length_sorted_chunks_preserve_order(fold_server):
    """Mixed-length fold requests are computed in length-sorted chunks (pad
    efficiency) but returned in request order with the right labels."""
    srv, handle = fold_server
    seqs = [("long", "MKTVRQERLKSIVRILERSK"), ("short", "MKTV"),
            ("mid", "MKTVRQERLK"), ("tiny", "MKT"), ("l2", "KALTARQQEVFDLIRDH")]
    out = _post(srv, {"sequences": [[l, s] for l, s in seqs], "num_recycles": 0},
                path="/fold")
    results = out["results"]
    assert [r["label"] for r in results] == [l for l, _ in seqs]
    for r, (_, s) in zip(results, seqs):
        assert r["length"] == len(s)
        assert r["pdb"].count(" CA ") == len(s), r["label"]


@pytest.mark.slow
def test_fold_endpoint(fold_server):
    srv, handle = fold_server
    h = _get(srv, "/healthz")
    assert h["endpoints"] == ["/fold"]

    out = _post(srv, {
        "sequences": [["mono", "MKTVRQERLK"], ["dimer", "MKT:RQE"]],
        "num_recycles": 1,
    }, path="/fold")
    mono, dimer = out["results"]
    assert mono["label"] == "mono" and mono["length"] == 10 and mono["num_chains"] == 1
    assert mono["pdb"].startswith("ATOM") and mono["pdb"].count(" CA ") == 10
    assert 0.0 <= mono["mean_plddt"] <= 100.0 and 0.0 <= mono["ptm"] <= 1.0
    assert dimer["num_chains"] == 2 and dimer["length"] == 6
    assert "TER" in dimer["pdb"]

    # parity with a direct infer_pdb call (same num_recycles)
    direct = handle.infer_pdb("MKTVRQERLK", num_recycles=1)
    # PDB text may differ in batch padding handling only if batched with the
    # dimer; refold alone for an exact check
    alone = _post(srv, {"sequences": ["MKTVRQERLK"], "num_recycles": 1}, path="/fold")
    assert alone["results"][0]["pdb"] == direct

    # embed endpoint must 400 on a fold-only server
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(srv, {"sequences": ["MKT"]})
    assert exc_info.value.code == 400
    assert "no LM loaded" in json.loads(exc_info.value.read())["error"]

    # fold input validation
    for payload, frag in [
        ({"sequences": ["MKT:"]}, "empty chain"),
        ({"sequences": ["MK T"]}, "invalid character"),
        ({"sequences": ["MKT"], "num_recycles": -1}, "non-negative"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(srv, payload, path="/fold")
        assert exc_info.value.code == 400
        assert frag in json.loads(exc_info.value.read())["error"], payload


# ---------------------------------------------------------------- streaming


def _post_raw(srv, payload, path="/embed"):
    req = urllib.request.Request(
        srv.url + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.headers, resp.read()


def _parse_npz_frames(raw):
    import io

    frames, off = [], 0
    while off < len(raw):
        n = int.from_bytes(raw[off : off + 8], "big")
        off += 8
        frames.append(np.load(io.BytesIO(raw[off : off + n])))
        off += n
    assert off == len(raw), "trailing bytes after the last npz frame"
    return frames


def test_stream_embed_ndjson_matches_buffered(server):
    """stream=true delivers one NDJSON object per sequence plus a {"done": N}
    terminator, numerically identical to the buffered response."""
    srv, _ = server
    payload = {
        "sequences": [["a", SEQS[0]], ["b", SEQS[1]], ["c", SEQS[2]]],
        "repr_layers": [-1],
        "include": ["mean", "logits"],
    }
    buffered = _post(srv, payload)["results"]
    headers, raw = _post_raw(srv, {**payload, "stream": True})
    assert headers["Content-Type"] == "application/x-ndjson"
    lines = [json.loads(line) for line in raw.splitlines()]
    assert lines[-1] == {"done": 3}
    items = sorted(lines[:-1], key=lambda d: d["index"])
    assert [d["index"] for d in items] == [0, 1, 2]
    for got, want in zip(items, buffered):
        assert got["label"] == want["label"] and got["length"] == want["length"]
        np.testing.assert_allclose(
            np.asarray(got["logits"]), np.asarray(want["logits"]), atol=1e-6
        )
        for k, v in want["mean_representations"].items():
            np.testing.assert_allclose(
                np.asarray(got["mean_representations"][k]), np.asarray(v), atol=1e-6
            )


def test_stream_embed_npz_frames(server):
    """Binary streaming: length-prefixed standalone .npz frames."""
    srv, model = server
    headers, raw = _post_raw(srv, {
        "sequences": [["a", SEQS[0]], ["b", SEQS[1]]],
        "repr_layers": [-1],
        "include": ["logits", "contacts"],
        "format": "npz",
        "stream": True,
    })
    assert headers["Content-Type"] == "application/x-npz-stream"
    frames = _parse_npz_frames(raw)
    assert int(frames[-1]["done"]) == 2
    items = sorted(frames[:-1], key=lambda f: int(f["index"]))
    assert len(items) == 2

    _, _, toks = model.alphabet.get_batch_converter(60)(
        [("a", SEQS[0]), ("b", SEQS[1])]
    )
    direct = model(toks, return_contacts=True)
    for i, (f, seq) in enumerate(zip(items, SEQS[:2])):
        L = min(len(seq), 60)
        assert str(f["label"]) == "ab"[i] and int(f["length"]) == L
        np.testing.assert_allclose(
            f["logits"], np.asarray(direct["logits"])[i, 1 : L + 1], atol=1e-5
        )
        np.testing.assert_allclose(
            f["contacts"], np.asarray(direct["contacts"])[i, :L, :L], atol=1e-5
        )


def test_stream_validation(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(srv, {"sequences": ["MKT"], "stream": "yes"})
    assert exc_info.value.code == 400
    assert "stream must be a bool" in json.loads(exc_info.value.read())["error"]


@pytest.mark.slow
def test_stream_fold_completion_order(fold_server):
    """Streamed folds arrive in device-completion order (length-sorted
    chunks), tagged with their request index; contents match the buffered
    response for the same request."""
    srv, _ = fold_server
    seqs = [("long", "MKTVRQERLKSIVRILERSK"), ("short", "MKTV"),
            ("mid", "MKTVRQERLK"), ("tiny", "MKT")]
    payload = {"sequences": [[l, s] for l, s in seqs], "num_recycles": 0}
    buffered = _post(srv, payload, path="/fold")["results"]
    headers, raw = _post_raw(srv, {**payload, "stream": True}, path="/fold")
    assert headers["Content-Type"] == "application/x-ndjson"
    lines = [json.loads(line) for line in raw.splitlines()]
    assert lines[-1] == {"done": 4}
    items = lines[:-1]
    # length-sorted chunks of max_fold_batch_seqs=2: (tiny, short) first
    assert [d["label"] for d in items] == ["tiny", "short", "mid", "long"]
    by_index = {d["index"]: d for d in items}
    assert sorted(by_index) == [0, 1, 2, 3]
    for j, want in enumerate(buffered):
        got = by_index[j]
        assert got["label"] == want["label"]
        assert got["pdb"] == want["pdb"]
        assert got["mean_plddt"] == want["mean_plddt"]
        assert got["ptm"] == want["ptm"]


def test_wrong_type_payload_is_400(server):
    """Well-formed JSON of the wrong type (repr_layers: 33, include: 5) must
    come back as a 400, not a dropped connection from an unwound handler."""
    srv, _ = server[0], server[1]
    for payload in (
        {"sequences": ["MKT"], "repr_layers": 33},
        {"sequences": ["MKT"], "include": 5},
        {"sequences": ["MKT"], "repr_layers": [None]},
    ):
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(srv, payload)
        assert exc_info.value.code == 400


def test_fold_length_cap(fold_server):
    """Folds cannot truncate: sequences over max_fold_seq_len get a permanent
    400 up front instead of an OOM that takes co-batched requests down."""
    srv, _ = fold_server
    old = srv.max_fold_seq_len
    srv.max_fold_seq_len = 30
    try:
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(srv, {"sequences": ["A" * 31]}, path="/fold")
        assert exc_info.value.code == 400
        assert "fold limit" in json.loads(exc_info.value.read())["error"]
        # a multimer is bounded by what the trunk FOLDS: chain residues plus
        # the 25-glycine linker per ':' (2+25+2 = 29 <= 30 admitted; 4+25+4
        # = 33 rejected even though only 8 letters are residues)
        ok = _post(srv, {"sequences": ["AA:AA"]}, path="/fold")
        assert len(ok["results"]) == 1
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(srv, {"sequences": ["AAAA:AAAA"]}, path="/fold")
        assert exc_info.value.code == 400
        assert "linker" in json.loads(exc_info.value.read())["error"]
    finally:
        srv.max_fold_seq_len = old


def test_fold_chunk_failure_isolated(fold_server):
    """A chunk that fails on device fails only its owning requests; other
    requests coalesced into the same fold group still complete."""
    srv, handle = fold_server
    real_infer = srv.fold_model.infer
    srv_fold_orig = srv.fold_model

    class _Wrapper:
        def infer(self, seqs, **kw):
            if any(len(s) == 13 for s in seqs):
                raise RuntimeError("synthetic device OOM")
            return real_infer(seqs, **kw)

        def __getattr__(self, name):
            return getattr(srv_fold_orig, name)

    srv.fold_model = _Wrapper()
    old_chunk = srv.max_fold_batch_seqs
    srv.max_fold_batch_seqs = 1  # one sequence per chunk -> full isolation
    try:
        results = {}

        def post(key, seq):
            try:
                results[key] = _post(srv, {"sequences": [seq]}, path="/fold")
            except urllib.error.HTTPError as e:
                results[key] = e.code

        threads = [
            threading.Thread(target=post, args=("good", "MKTAYIAKQR")),
            threading.Thread(target=post, args=("poison", "A" * 13)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert results["poison"] == 500
        assert isinstance(results["good"], dict) and "results" in results["good"]
    finally:
        srv.fold_model = srv_fold_orig
        srv.max_fold_batch_seqs = old_chunk


def test_adaptive_refill_window(tmp_path):
    """After a FULL batch the wait window extends to refill_wait_ms so the
    re-post wave coalesces; light-load requests keep the short window.
    Verified via the _last_batch_full signal plus a coalescing round."""
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=1, embed_dim=32, attention_heads=2
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    model = LMHandle("esm2", cfg, params, alphabet)
    srv = InferenceServer(
        model, max_batch_seqs=4, max_wait_ms=1.0, refill_wait_ms=400.0,
        truncation_seq_length=60,
    ).start()
    try:
        assert srv.max_wait_s == pytest.approx(0.001)
        assert srv.refill_wait_s == pytest.approx(0.4)
        assert srv._last_batch_full is False

        # a full batch (4 sequences in one request) flips the signal
        _post(srv, {"sequences": [SEQS[0], SEQS[1], SEQS[2], SEQS[0]],
                    "include": ["mean"]})
        assert srv._last_batch_full is True

        # the next round runs under the 400 ms refill window: two requests
        # posted ~50 ms apart MUST land in one batch despite max_wait_ms=1
        before = _get(srv, "/stats")
        results = [None, None]

        def w(j, delay):
            time.sleep(delay)
            results[j] = _post(srv, {"sequences": [SEQS[j]], "include": ["mean"]})

        ts = [threading.Thread(target=w, args=(j, 0.05 * j)) for j in range(2)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert all(r is not None for r in results)
        after = _get(srv, "/stats")
        assert after["batches"] - before["batches"] == 1, (before, after)
        # ...and a small batch resets the signal to the short window
        assert srv._last_batch_full is False
    finally:
        srv.stop()


def test_prewarm(server):
    """prewarm() walks the production dispatch for every standard (B, T)
    shape and leaves request stats untouched (it is not traffic)."""
    srv, model = server
    before = _get(srv, "/stats")
    n = srv.prewarm(lengths=[10, 30], batch_sizes=(1, 2))
    assert n == 4
    after = _get(srv, "/stats")
    assert after["requests"] == before["requests"]
    # server still serves, and a prewarmed shape returns correct numerics
    out = _post(srv, {"sequences": [SEQS[0]], "include": ["mean"]})
    assert len(out["results"]) == 1


def test_prewarm_fold(fold_server):
    """prewarm_fold compiles chosen 64-bucket fold shapes via the production
    path (bucketed, frugal) and counts shapes; no stats traffic."""
    srv, _ = fold_server
    before = _get(srv, "/stats")
    n = srv.prewarm_fold(lengths=[10], batch_sizes=(1, 2))
    assert n == 2
    after = _get(srv, "/stats")
    assert after["requests"] == before["requests"]


def test_fold_cap_from_memory_plan(tmp_path, monkeypatch):
    """max_fold_seq_len=None derives the cap from plan_fold for this model's
    config/precision — memory planning as API, not a hardcoded constant."""
    from tests.test_fold_cli import _make_cache

    cache, fold_path = _make_cache(tmp_path)
    monkeypatch.setenv("ESM_TPU_CACHE", str(cache))
    from esm_tpu import pretrained

    handle = pretrained.load_esmfold(str(fold_path))
    srv = InferenceServer(fold_model=handle, max_fold_seq_len=None)
    # unchunked triangle attention is O(L^3): even a tiny model gets a
    # finite cap from the plan
    assert isinstance(srv.max_fold_seq_len, int) and srv.max_fold_seq_len > 256
    # chunking removes the O(L^3) term -> the derived cap grows
    handle.set_chunk_size(64)
    srv_chunked = InferenceServer(fold_model=handle, max_fold_seq_len=None)
    assert srv_chunked.max_fold_seq_len > srv.max_fold_seq_len
    # explicit cap still honored
    srv2 = InferenceServer(fold_model=handle, max_fold_seq_len=777)
    assert srv2.max_fold_seq_len == 777


# --------------------------------------------------- cost-weighted admission


def test_cost_weighted_admission_429(server):
    """Admission charges estimated chip-seconds, not sequence counts: with a
    1-second backlog budget and a 0.4 s/seq cost estimate, two in-flight
    sequences saturate the server even though the COUNT cap (256) is far
    away, and the Retry-After reports the backlog's drain estimate."""
    _, model = server
    srv = InferenceServer(
        model,
        max_wait_ms=2000.0,  # hold the first request in the batch window
        truncation_seq_length=60,
        max_queued_seconds=1.0,
    ).start()
    srv._cost_unit["embed"] = 0.4  # pretend embeds are expensive
    try:
        results = {}

        def post_a():
            results["a"] = _post(srv, {"sequences": SEQS[:2]})

        t = threading.Thread(target=post_a)
        t.start()
        for _ in range(100):
            if _get(srv, "/stats")["inflight_cost_s"] >= 0.8:
                break
            time.sleep(0.02)
        else:
            pytest.fail("request A never became in-flight")

        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(srv, {"sequences": SEQS[2:3]})  # 0.4 + 0.8 > 1.0
        assert exc_info.value.code == 429
        body = json.loads(exc_info.value.read())
        assert "estimated work in flight" in body["error"]
        # Retry-After = drain time of the admitted backlog (0.8s -> 1)
        assert int(exc_info.value.headers["Retry-After"]) == 1

        t.join(timeout=120)
        assert "results" in results["a"]
        ok = _post(srv, {"sequences": SEQS[2:3]})  # backlog drained
        assert "results" in ok
        stats = _get(srv, "/stats")
        assert stats["rejected"] >= 1
        assert stats["inflight_cost_s"] == 0
        assert stats["max_queued_seconds"] == 1.0
    finally:
        srv.stop()


def test_over_budget_request_is_permanent_400(server):
    """A single request whose estimated cost exceeds the whole backlog budget
    can never be admitted — permanent 400, not a retried-forever 429."""
    _, model = server
    srv = InferenceServer(
        model, truncation_seq_length=60, max_queued_seconds=1.0
    ).start()
    # the permanent verdict is judged at the STATIC priors (learned units
    # drift over cold compiles and must not make a 400 transient)
    srv._cost_prior["embed"] = 0.6
    srv._cost_unit["embed"] = 0.6
    try:
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(srv, {"sequences": SEQS[:2]})  # 1.2s > 1.0s budget
        assert exc_info.value.code == 400
        body = json.loads(exc_info.value.read())
        assert "split the request or raise" in body["error"]
        # still healthy for affordable requests
        ok = _post(srv, {"sequences": SEQS[:1]})
        assert "results" in ok
    finally:
        srv.stop()


def test_cost_model_learns_and_reports(server):
    """Completed batches feed the per-kind EMA; /stats exposes the learned
    units, the in-flight cost, and per-kind latency percentiles."""
    _, model = server
    srv = InferenceServer(model, truncation_seq_length=60).start()
    try:
        prior = srv._cost_unit["embed"]
        _post(srv, {"sequences": SEQS})
        stats = _get(srv, "/stats")
        assert stats["cost_unit_s"]["embed"] != prior  # EMA moved
        assert stats["cost_unit_s"]["embed"] > 0
        assert stats["inflight_cost_s"] == 0  # released on finish
        assert "latency_embed_p50_ms" in stats
        assert "latency_embed_p95_ms" in stats
        assert "latency_fold_p50_ms" not in stats  # no folds served
    finally:
        srv.stop()


def test_fold_cost_matches_measured_scaling(server):
    """The fold admission cost model must match the repo's OWN measured fold
    times (BENCH_NOTES single-pass rows: 0.18 s @ bucket 256 / 3.5 s @ 1024 /
    9.7 s @ 1536 / 21.7 s @ 2048): unit * units(L) reproduces the measured
    seconds at every calibration length, the long-L scaling is cubic (the
    round-4 quadratic under-counted an L=2048 fold ~2.3x), and the unit
    scales with trunk passes."""
    _, model = server
    srv = InferenceServer(model, truncation_seq_length=60)
    u = srv._fold_units
    # unit = the measured single-pass bucket-512 cost the polynomial is
    # normalized to (0.684 s, bf16 trunk + fused triangle kernels)
    unit = 0.684
    for n_res, seconds in ((200, 0.18), (1000, 3.5), (1500, 9.7), (2000, 21.7)):
        est = unit * u(["A" * n_res], 0)  # num_recycles=0 -> one trunk pass
        assert est == pytest.approx(seconds, rel=0.11), (n_res, est, seconds)
    # long-L ratio is cubic-dominated, NOT quadratic: measured 21.7/9.7=2.24
    ratio = u(["A" * 2000], 0) / u(["A" * 1500], 0)
    assert ratio == pytest.approx(21.7 / 9.7, rel=0.05)
    assert ratio > (2048 / 1536) ** 2 * 1.1  # a pure quadratic is ruled out
    # recycles multiply work: explicit R -> R+1 trunk passes (trunk.py
    # semantics); None -> the checkpoint's max_recycles passes
    assert u(["A" * 100], 3) == pytest.approx(4 * u(["A" * 100], 0))
    passes_default = srv._fold_passes(None)
    assert passes_default >= 1
    assert u(["A" * 100]) == pytest.approx(passes_default * u(["A" * 100], 0))
    # multimers are charged for the 25-G linker the fold path inserts per
    # ':' (encode_sequence): 60+25+60 = 145 residues -> bucket 192, which
    # costs more than a 128-bucket monomer
    assert u(["A" * 60 + ":" + "A" * 60], 0) > u(["A" * 100], 0)
    # at the default priors a bucketed-1024 fold costs >>100x an embed seq
    from esm_tpu.runtime.server import _Request

    fold_cost = srv._estimate_cost(_Request(["x"], ["A" * 1000], kind="fold"))
    embed_cost = srv._estimate_cost(_Request(["x"], ["A" * 1000]))
    assert fold_cost / embed_cost > 100
    srv._httpd.server_close()  # never started; free the socket


def test_idle_server_always_admits_and_ema_clamp(server):
    """An idle server admits a request even when the learned cost estimate
    spikes over the budget (cold-compile robustness: something must always
    run, or an estimate spike would deadlock the server); a single EMA
    update can at most triple a unit."""
    _, model = server
    srv = InferenceServer(
        model, truncation_seq_length=60, max_queued_seconds=1.0
    ).start()
    # learned unit spiked (e.g. over a cold compile): 2 seqs "cost" 100s
    srv._cost_unit["embed"] = 50.0
    try:
        ok = _post(srv, {"sequences": SEQS[:2]})  # idle -> still admitted
        assert "results" in ok
        # growth clamp: a compile-dominated observation can't explode the unit
        srv._cost_unit["embed"] = 0.01
        srv._observe_cost("embed", seconds=100.0, units=1)
        assert srv._cost_unit["embed"] == pytest.approx(0.03)  # 3x, not 30+
        # decay is unclamped
        srv._observe_cost("embed", seconds=0.001, units=1)
        assert srv._cost_unit["embed"] < 0.022
    finally:
        srv.stop()


def test_zero_budget_disables_cost_cap(server):
    """max_queued_seconds=0 means 'disabled' (as the CLI documents), not a
    literal zero-second budget that would permanently 400 every request."""
    _, model = server
    srv = InferenceServer(
        model, truncation_seq_length=60, max_queued_seconds=0
    ).start()
    try:
        assert srv.max_queued_seconds is None
        ok = _post(srv, {"sequences": SEQS[:2]})
        assert "results" in ok
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# /design: inverse-folding as a service (ESM-IF1 sample + score)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def design_server():
    from esm_tpu.models.inverse_folding import init as if_init
    from esm_tpu.models.inverse_folding.model import GVPTransformerConfig
    from esm_tpu.pretrained import IFHandle


    if_alphabet = Alphabet.from_architecture("invariant_gvp")
    cfg = GVPTransformerConfig(
        encoder_embed_dim=32, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_embed_dim=64, decoder_embed_dim=32, decoder_layers=1,
        decoder_attention_heads=2, decoder_ffn_embed_dim=64,
        gvp_top_k_neighbors=5, gvp_node_hidden_dim_scalar=16,
        gvp_node_hidden_dim_vector=4, gvp_edge_hidden_dim_scalar=8,
        gvp_edge_hidden_dim_vector=1, gvp_num_encoder_layers=1,
    )
    params = if_init(jax.random.PRNGKey(4), cfg)
    if_model = IFHandle(cfg, params, if_alphabet)
    srv = InferenceServer(if_model=if_model, max_wait_ms=50.0).start()
    yield srv, if_model
    srv.stop()


def _backbone(L, seed=0):
    rng = np.random.default_rng(seed)
    return np.cumsum(rng.normal(0, 1.0, (L, 3, 3)).astype(np.float32), axis=0)


def test_design_sample_and_score(design_server):
    srv, if_model = design_server
    coords = _backbone(12)

    out = _post(srv, {
        "coords": coords.tolist(), "num_samples": 2, "seed": 7,
        "temperature": 1.0, "label": "bb1",
    }, path="/design")
    r = out["results"][0]
    assert r["label"] == "bb1" and len(r["sequences"]) == 2
    # deterministic: a direct batched call with the same (seed, bucket)
    # reproduces both samples — the server runs num_samples as ONE batched
    # decode on the 16-bucketed backbone (compare strings, not characters:
    # a random-init model may emit multi-char special tokens)
    direct = if_model.sample(
        coords, temperature=1.0, seed=7, num_samples=2, pad_to_multiple=16
    )
    assert r["sequences"] == direct
    # "bucket": 0 decodes at the exact length and matches the plain call
    out0 = _post(srv, {
        "coords": coords.tolist(), "seed": 7, "bucket": 0,
    }, path="/design")
    assert out0["results"][0]["sequences"][0] == if_model.sample(
        coords, temperature=1.0, seed=7
    )

    # scoring mode matches the direct score (fixed valid sequence — a
    # random-init model's samples can contain non-residue tokens)
    seq = "KALTARQQEVFD"
    out = _post(srv, {"coords": coords.tolist(), "seq": seq}, path="/design")
    r = out["results"][0]
    ll_full, ll_coord = if_model.score_sequence(coords, seq)
    assert r["ll_fullseq"] == pytest.approx(ll_full, abs=1e-5)
    assert r["ll_withcoord"] == pytest.approx(ll_coord, abs=1e-5)
    # the design latency/cost/counter plumbing engaged
    stats = srv.stats()
    assert stats["cost_unit_s"]["design"] > 0
    assert stats["design_batches"] >= 2 and stats["designed_backbones"] >= 2


def test_design_validation_errors(design_server):
    srv, _ = design_server

    def expect_400(payload, match):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, payload, path="/design")
        assert e.value.code == 400
        body = json.loads(e.value.read())
        assert match in body["error"], body

    expect_400({}, "exactly one")
    expect_400({"coords": [[0, 0, 0]]}, "(L, 3, 3)")
    expect_400({"coords": _backbone(4).tolist(), "pdb": "x"}, "exactly one")
    expect_400({"coords": _backbone(4).tolist(), "temperature": 0}, "temperature")
    expect_400({"coords": _backbone(4).tolist(), "num_samples": 99}, "num_samples")
    expect_400({"coords": _backbone(4).tolist(), "seq": "AG"}, "one residue per")
    expect_400({"coords": _backbone(4).tolist(), "seq": "AGX7"}, "unknown residue")
    expect_400(
        {"coords": _backbone(4).tolist(), "seq": "AGAG", "partial_seq": "A"},
        "only applies",
    )
    expect_400({"coords": _backbone(4).tolist(), "seed": 2**63}, "seed")
    expect_400({"coords": _backbone(4).tolist(), "bucket": -1}, "bucket")


def test_design_without_if_model_is_400(server):
    srv, _ = server  # the LM-only fixture has no if_model
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, {"coords": _backbone(4).tolist()}, path="/design")
    assert e.value.code == 400
    assert "--if-model" in json.loads(e.value.read())["error"]


def test_design_from_pdb_payload(design_server):
    """A PDB file string round-trips through the host-side parser to the
    same backbone the coords payload uses."""
    srv, if_model = design_server
    coords = _backbone(6, seed=3)
    lines = []
    atoms = ("N", "CA", "C")
    serial = 1
    for i, res in enumerate(coords):
        for a, xyz in zip(atoms, res):
            # fixed PDB columns: name 13-16 (short names start col 14),
            # altLoc 17, resName 18-20, chain 22, resSeq 23-26, x from 31
            lines.append(
                f"ATOM  {serial:5d}  {a:<3s} ALA A{i + 1:4d}    "
                f"{xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}  1.00  0.00          "
                f"{a[0]:>2s}"
            )
            serial += 1
    pdb = "\n".join(lines) + "\nEND\n"
    out = _post(srv, {"pdb": pdb, "chain": "A", "seed": 1}, path="/design")
    r = out["results"][0]
    # the real check: the server's PDB parse yields the same backbone the
    # coords payload would — the seeded (bucketed) sample is identical (a
    # random-init model may emit multi-char special tokens, so compare
    # strings, not lengths)
    assert r["sequences"][0] == if_model.sample(
        coords, temperature=1.0, seed=1, pad_to_multiple=16
    )
    # an unknown chain is a client error that names the chain, not a reset
    # connection or a complaint about a "coords" field the client never sent
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, {"pdb": pdb, "chain": "Z"}, path="/design")
    assert e.value.code == 400 and "chain" in json.loads(e.value.read())["error"]


def test_prewarm_design(design_server, server):
    srv, _ = design_server
    assert srv.prewarm_design([8, 12]) == 2
    # LM-only servers return 0 rather than raising
    lm_srv, _ = server
    assert lm_srv.prewarm_design([8]) == 0
