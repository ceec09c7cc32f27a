"""Fleet router tests: least-loaded routing over real in-process workers,
fail-over before first byte, aggregated health."""

import asyncio
import io
import wave

import numpy as np
import pytest

pytest.importorskip("aiohttp")
from aiohttp import web  # noqa: E402
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from pocket_tts_tpu import weights  # noqa: E402
from pocket_tts_tpu.models.mimi import MimiPlans  # noqa: E402
from pocket_tts_tpu.runtime.engine import GenParams  # noqa: E402
from pocket_tts_tpu.server.app import ServerState, create_app  # noqa: E402
from pocket_tts_tpu.server.fleet import FleetState, create_router_app  # noqa: E402
from pocket_tts_tpu.tts import TTSModel  # noqa: E402
from tests.test_tts import CFG  # noqa: E402


@pytest.fixture(scope="module")
def model():
    plans = MimiPlans(CFG.mimi)
    params = weights.random_params(CFG, plans, seed=3)
    return TTSModel(CFG, params, gen=GenParams(temp=0.0), has_real_weights=False)


@pytest.fixture()
def fleet(model):
    """Router over two real workers plus one dead URL."""
    loop = asyncio.new_event_loop()
    workers = []
    for _ in range(2):
        srv = TestServer(create_app(ServerState(model)))
        loop.run_until_complete(srv.start_server())
        workers.append(srv)
    urls = [str(s.make_url("/"))[:-1] for s in workers]
    urls.append("http://127.0.0.1:9")  # port 9: nothing listens — dead worker
    state = FleetState(urls)
    client = TestClient(TestServer(create_router_app(state)), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop, state
    loop.run_until_complete(client.close())
    for s in workers:
        loop.run_until_complete(s.close())
    loop.close()


def test_fleet_health_aggregates(fleet):
    client, loop, state = fleet

    async def go():
        resp = await client.get("/health")
        return resp.status, await resp.json()

    status, body = loop.run_until_complete(go())
    assert status == 200
    assert body["status"] == "ok"
    assert body["workers_ok"] == 2
    assert len(body["workers"]) == 3
    assert any(w.get("status") == "unreachable" for w in body["workers"])


def test_fleet_generate_and_failover(fleet):
    """Requests must succeed even when the least-loaded candidate is dead
    (fail-over before first byte), and produce a valid WAV."""
    client, loop, state = fleet
    # make the dead worker look most attractive so routing must fail over
    for w in state.workers:
        w.outstanding = 0 if w.url.endswith(":9") else 1
        w.healthy = True

    async def go():
        resp = await client.post("/generate", json={"text": "Fleet hello."})
        return resp.status, await resp.read()

    status, data = loop.run_until_complete(go())
    assert status == 200
    with wave.open(io.BytesIO(data), "rb") as f:
        assert f.getframerate() == 24000
        assert f.getnframes() > 0
    dead = next(w for w in state.workers if w.url.endswith(":9"))
    assert not dead.healthy and dead.last_error


def test_fleet_stream_passthrough(fleet):
    client, loop, state = fleet

    async def go():
        resp = await client.post("/stream", json={"text": "Streaming fleet."})
        assert resp.status == 200
        return await resp.read()

    pcm = loop.run_until_complete(go())
    assert len(pcm) > 0 and len(pcm) % 2 == 0
    a = np.frombuffer(pcm, "<i2")
    assert np.isfinite(a.astype(np.float32)).all()


def test_fleet_all_dead_503():
    loop = asyncio.new_event_loop()
    state = FleetState(["http://127.0.0.1:9", "http://127.0.0.1:10"])
    client = TestClient(TestServer(create_router_app(state)), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def go():
            resp = await client.post("/generate", json={"text": "x"})
            return resp.status

        assert loop.run_until_complete(go()) == 503
    finally:
        loop.run_until_complete(client.close())
        loop.close()


def test_fleet_degraded_worker_not_marked_healthy(model):
    """A worker that answers 200 {"status": "degraded"} (fail-open after a
    batcher crash) must not be resurrected into the healthy routing set by
    the health probe."""
    loop = asyncio.new_event_loop()

    async def degraded_health(request):
        return web.json_response({"status": "degraded"})

    stub = web.Application()
    stub.router.add_get("/health", degraded_health)
    stub_srv = TestServer(stub)
    loop.run_until_complete(stub_srv.start_server())

    real_srv = TestServer(create_app(ServerState(model)))
    loop.run_until_complete(real_srv.start_server())

    state = FleetState([str(stub_srv.make_url("/"))[:-1],
                        str(real_srv.make_url("/"))[:-1]])
    client = TestClient(TestServer(create_router_app(state)), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def go():
            h = await client.get("/health")
            body = await h.json()
            g = await client.post("/generate", json={"text": "Degraded test."})
            return body, g.status

        body, status = loop.run_until_complete(go())
        assert body["workers_ok"] == 1
        assert not state.workers[0].healthy  # degraded stub stays unhealthy
        assert state.workers[1].healthy
        assert status == 200
    finally:
        loop.run_until_complete(client.close())
        loop.run_until_complete(stub_srv.close())
        loop.run_until_complete(real_srv.close())
        loop.close()


def test_fleet_forwards_query_string(model):
    """The proxy must forward the query string (request.path_qs), not just the
    path — regression: /generate?trace=1 reached workers as bare /generate."""
    loop = asyncio.new_event_loop()

    seen = []

    async def echo(request):
        seen.append(request.path_qs)
        return web.Response(body=b"ok", content_type="audio/wav")

    stub = web.Application()
    stub.router.add_post("/generate", echo)
    srv = TestServer(stub)
    loop.run_until_complete(srv.start_server())
    state = FleetState([str(srv.make_url("/"))[:-1]])
    client = TestClient(TestServer(create_router_app(state)), loop=loop)
    loop.run_until_complete(client.start_server())

    async def go():
        resp = await client.post("/generate?trace=1&x=a%20b",
                                 json={"text": "hi"})
        assert resp.status == 200

    loop.run_until_complete(go())
    loop.run_until_complete(client.close())
    loop.run_until_complete(srv.close())
    loop.close()
    assert seen == ["/generate?trace=1&x=a%20b"]
