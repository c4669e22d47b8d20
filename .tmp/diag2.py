import sys, time
sys.path.insert(0, "/root/repo")
from msgraphdatapipelines_spark.session import get_spark
from msgraphdatapipelines_spark import streaming as ST
from msgraphdatapipelines_spark.streaming.stateful import first_seen_dedup
from msgraphdatapipelines_spark.queries import _harden

spark = get_spark(cpus=8)
spark.sparkContext.setLogLevel("ERROR")
_harden(spark)
ev = ST.read_events_stream(spark, "/root/testdata/sf0.001", glob="events.parquet")
q = (first_seen_dedup(ev).writeStream.outputMode("update")
     .format("memory").queryName("diag2").trigger(availableNow=True).start())
t0 = time.monotonic()
while time.monotonic() - t0 < 90:
    time.sleep(5)
    print(f"[{time.monotonic()-t0:.0f}s] active={q.isActive} status={q.status}", flush=True)
    if not q.isActive:
        break
print("FINAL active:", q.isActive, flush=True)
if q.isActive:
    q.stop()
print("rows:", spark.table("diag2").count(), flush=True)
