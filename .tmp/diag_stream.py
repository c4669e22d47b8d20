import sys, time, threading
sys.path.insert(0, "/root/repo")
from msgraphdatapipelines_spark.queries import REGISTRY, _ensure_loaded
from msgraphdatapipelines_spark.session import get_spark
_ensure_loaded()
spark = get_spark(cpus=8)
spark.sparkContext.setLogLevel("ERROR")
name = sys.argv[1]
t0 = time.monotonic()
def watchdog():
    while True:
        time.sleep(10)
        print(f"[{time.monotonic()-t0:.0f}s] active streams: "
              f"{[(q.name, q.status) for q in spark.streams.active]}", flush=True)
threading.Thread(target=watchdog, daemon=True).start()
df = REGISTRY[name].fn(spark, "/root/testdata/sf0.01")
print("PLAN DONE", round(time.monotonic()-t0, 1), flush=True)
print("ROWS", df.count(), round(time.monotonic()-t0, 1), flush=True)
