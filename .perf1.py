import sys, time; sys.path.insert(0, "/root/repo")
from biomed_timeseries_preprocessing_spark.session import get_spark
from biomed_timeseries_preprocessing_spark.sources.events_adapter import events_as_transcripts, load_events
from biomed_timeseries_preprocessing_spark.operators.derive import with_derived
from biomed_timeseries_preprocessing_spark.operators.rollup import rollup_from_turns, rollup_merge

spark = get_spark(master="local[32]")
sf = "/root/testdata/sf0.1"

def t(label, df):
    t0=time.time(); n=df.count(); print(f"{label}: {n} rows {time.time()-t0:.2f}s")

ev = load_events(spark, sf)
t("events", ev)
tr = events_as_transcripts(ev)
t("as_transcripts", tr)
d = with_derived(tr)
t("derived", d)
r1 = rollup_from_turns(d, "1m")
t("rollup_1m", r1)
r5 = rollup_merge(r1, "5m")
t("5m", r5)
rh = rollup_merge(r5, "1h")
t("1h", rh)
rd = rollup_merge(rh, "1d")
t("1d", rd)
t0=time.time(); rd.write.mode("overwrite").format("noop").save(); print(f"noop full: {time.time()-t0:.2f}s")
rd.explain("formatted")
