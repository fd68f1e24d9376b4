"""Real-network streaming connector: Spark's TCP socket source against
an in-process server.

The sandbox cannot reach live Kafka/Hive/JDBC services (the one
`partial` row in SURVEY §2.1), so connector evidence is layered:
file formats (test_sources), a real SQL database over a wire protocol
(test_sqlite_connector), the custom Python DataSource with offset-based
streaming (test_sources/docgen), and — here — a genuine network
STREAMING source: `readStream.format("socket")` consuming newline
framing over a real localhost TCP connection, the same
source-function shape as the reference's SocketTableSource
(flink-streaming-java SocketTextStreamFunction.java).
"""

from __future__ import annotations

import socket
import threading
import time

from pyspark.sql import functions as F

N_LINES = 200


def _serve(sock: socket.socket, lines: list[str]) -> None:
    conn, _ = sock.accept()
    try:
        for ln in lines:
            conn.sendall((ln + "\n").encode())
        # keep the connection open long enough for Spark to drain it;
        # the test stops the query, then this thread exits
        time.sleep(30)
    except OSError:
        pass
    finally:
        conn.close()
        sock.close()


def test_socket_stream_windowed_count(spark):
    lines = [f"user{i % 7},{i}" for i in range(N_LINES)]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    srv.listen(1)
    t = threading.Thread(target=_serve, args=(srv, lines), daemon=True)
    t.start()

    raw = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    parsed = raw.select(
        F.split("value", ",").getItem(0).alias("user"),
        F.split("value", ",").getItem(1).cast("long").alias("seq"),
    )
    q = (
        parsed.writeStream.outputMode("append")
        .format("memory")
        .queryName("socket_rows")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM socket_rows").first().c >= N_LINES:
                break
            time.sleep(0.5)
        got = spark.sql(
            "SELECT user, count(*) AS cnt, sum(seq) AS s "
            "FROM socket_rows GROUP BY user ORDER BY user"
        ).collect()
    finally:
        q.stop()

    assert sum(r.cnt for r in got) == N_LINES
    expect = {}
    for i in range(N_LINES):
        u = f"user{i % 7}"
        c, s = expect.get(u, (0, 0))
        expect[u] = (c + 1, s + i)
    assert {r.user: (r.cnt, r.s) for r in got} == expect
