#!/usr/bin/env python3
"""Latency bench for the HttpApi estimate surface (VERDICT r7 next-round #9).

Fires N requests at GET /api/estimate (and POST /api/estimate with a JSON
body) from C concurrent clients against an already-running server, reports
p50/p95/p99/max per surface. Stdlib only.

Usage: python3 tools/http_bench.py [host:port] [--n 2000] [--c 8]
"""
import http.client
import json
import statistics
import sys
import threading
import time

GET_PATH = ("/api/estimate?project_name=bench&messages_per_second=5000"
            "&avg_record_size_bytes=512&worker_node_memory_gb=16"
            "&simple_statements=2&medium_statements=1&complex_statements=1")
POST_BODY = json.dumps({
    "project_name": "bench", "messages_per_second": 5000,
    "avg_record_size_bytes": 512, "worker_node_memory_mb": 16384.0,
})


def worker(host, port, n, method, out, errs):
    conn = http.client.HTTPConnection(host, port, timeout=30)
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        try:
            if method == "GET":
                conn.request("GET", GET_PATH)
            else:
                conn.request("POST", "/api/estimate", body=POST_BODY,
                             headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            body = resp.read()
            if resp.status != 200 or b"total_cpus" not in body:
                errs.append(resp.status)
        except Exception as e:
            errs.append(str(e))
            conn.close()
            conn = http.client.HTTPConnection(host, port, timeout=30)
            continue
        lat.append((time.perf_counter() - t0) * 1000)
    conn.close()
    out.extend(lat)


def run(host, port, n, c, method):
    per = n // c
    out, errs = [], []
    threads = [threading.Thread(target=worker,
                                args=(host, port, per, method, out, errs))
               for _ in range(c)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    out.sort()
    if len(out) < 2:
        # server down / refusing: report instead of a StatisticsError trace
        print(json.dumps({"method": method, "n": len(out), "clients": c,
                          "errors": len(errs), "error": "too few samples"}))
        sys.exit(1)
    q = statistics.quantiles(out, n=100)
    return {
        "method": method, "n": len(out), "clients": c, "errors": len(errs),
        "rps": round(len(out) / wall, 1),
        "p50_ms": round(q[49], 2), "p95_ms": round(q[94], 2),
        "p99_ms": round(q[98], 2), "max_ms": round(out[-1], 2),
    }


def main():
    target = sys.argv[1] if len(sys.argv) > 1 and ":" in sys.argv[1] else "localhost:8123"
    host, port = target.split(":")
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 2000
    c = int(sys.argv[sys.argv.index("--c") + 1]) if "--c" in sys.argv else 8
    # warmup (JIT, codepath)
    run(host, int(port), 200, 4, "GET")
    for method in ("GET", "POST"):
        print(json.dumps(run(host, int(port), n, c, method)))


if __name__ == "__main__":
    main()
