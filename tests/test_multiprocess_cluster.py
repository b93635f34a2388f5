"""THE deployment test: a 3-node cluster as three OS processes talking over
real gRPC sockets — `cli serve --node-id --peers` end to end (the topology the
reference's stubs never reached)."""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from grape_vector_db_tpu.server.grpc_server import VectorDbClient
from grape_vector_db_tpu.server.proto import vector_db_pb2 as pb


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_three_process_cluster(tmp_path):
    ports = {f"n{i}": _free_port() for i in range(3)}
    peers = ",".join(f"{nid}=127.0.0.1:{p}" for nid, p in ports.items())
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    try:
        for nid in ports:
            procs.append(subprocess.Popen(
                [sys.executable, "-c",
                 "import jax; jax.config.update('jax_platforms','cpu');"
                 "from grape_vector_db_tpu.cli import main;"
                 f"main(['serve','--host','127.0.0.1','--rest-port','0',"
                 f"'--node-id',{nid!r},'--peers',{peers!r},"
                 f"'--shard-count','4','--replica-count','2',"
                 f"'--data-dir',{str(tmp_path / nid)!r},"
                 "'--config','/dev/null'])"],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            ))
        # wait for all three banners
        for p in procs:
            deadline = time.monotonic() + 90
            while time.monotonic() < deadline:
                line = p.stdout.readline()
                if "serving:" in line:
                    break
            else:
                pytest.fail("node never served")

        clients = {nid: VectorDbClient(f"127.0.0.1:{p}") for nid, p in ports.items()}
        # membership converges across processes
        deadline = time.monotonic() + 60
        ok = False
        while time.monotonic() < deadline:
            infos = [c.call("GetClusterInfo", pb.GetClusterInfoRequest(),
                            timeout_s=5) for c in clients.values()]
            if all(len(i.members) == 3 for i in infos) and any(
                i.leader_id for i in infos
            ):
                ok = True
                break
            time.sleep(0.3)
        assert ok, "cluster membership never converged across processes"

        # cluster-routed write on n0, scatter-gather read on n2
        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((20, 768)).astype(float)
        resp = clients["n0"].upsert_points([
            pb.Point(id=f"mp{i}", vector=pb.Vector(values=vecs[i]))
            for i in range(20)
        ])
        assert resp.upserted == 20, resp.error
        # bounded retry: the upsert ack covers the coordinator + sync
        # replicas; an async replica chosen by scatter-gather may lag the
        # write by a beat under CI load
        deadline = time.monotonic() + 10
        while True:
            sr = clients["n2"].search(list(vecs[7]), limit=3)
            assert not sr.error
            if sr.results and sr.results[0].id == "mp7":
                break
            if time.monotonic() > deadline:
                pytest.fail(f"mp7 never surfaced: {sr.results[:3]}")
            time.sleep(0.3)
        assert sr.results[0].score > 0.99
        for c in clients.values():
            c.close()
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
