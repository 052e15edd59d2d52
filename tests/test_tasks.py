"""Tests: TCP task farm (serve/query/sink)."""
import threading
import time

from celldetection_tpu.parallel import TaskServer, query, sink


def test_task_farm_end_to_end():
    port = 15731
    with TaskServer(range(10), port=port) as server:
        def worker():
            for task in query('127.0.0.1', port=port):
                sink('127.0.0.1', task * 2, port=port + 1)

        threads = [threading.Thread(target=worker) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        deadline = time.time() + 5
        while len(server.results) < 10 and time.time() < deadline:
            time.sleep(0.05)
        assert sorted(server.results) == [i * 2 for i in range(10)]
