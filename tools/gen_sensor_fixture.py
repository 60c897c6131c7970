#!/usr/bin/env python3
"""Deterministic SIMPSS-shaped sensor fixtures (FIXTURES.md §1).

Writes:
  data/sensor_group.csv          — sensor_id -> group_id dimension (40 sensors, 4 groups)
  data/sensor_readings.ndjson    — clean wire records + time_received + seq
                                   (~2500 lines, ~10% duplicate PKs for last-write-wins)
  data/sensor_readings_dirty.ndjson — clean lines interleaved with violations
                                   (unknown id / missing key / extra key / malformed JSON)
                                   for strict-parse + DLQ unit tests.

Seeded; rerunning reproduces byte-identical files.
"""
import json
import random

random.seed(1234)

SENSORS = list(range(100, 140))
GROUPS = {s: f"g{(s % 4) + 1}" for s in SENSORS}
BASE_TS = 1709287200  # 2024-03-01T10:00:00 UTC


def iso(epoch):
    import datetime
    return datetime.datetime.fromtimestamp(epoch, datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S")


def reading(sensor, ts_epoch, seq):
    return {
        "id": sensor,
        "uptime": random.randint(0, 100000),
        "T": random.randint(-10, 45),
        "P": random.randint(950, 1050),
        "H": random.randint(0, 100),
        "Ix": random.randint(-100, 100),
        "Iy": random.randint(-100, 100),
        "Iz": random.randint(-100, 100),
        "M": random.randint(0, 255),
        "time_received": iso(ts_epoch),
        "seq": seq,
    }


def main():
    with open("data/sensor_group.csv", "w") as f:
        f.write("sensor_id,group_id\n")
        for s in SENSORS:
            f.write(f"{s},{GROUPS[s]}\n")

    lines = []
    seq = 0
    for i in range(2200):
        sensor = random.choice(SENSORS)
        ts = BASE_TS + random.randint(0, 3600)
        lines.append(reading(sensor, ts, seq))
        seq += 1
        if random.random() < 0.12:  # duplicate PK, later seq, new measures
            dup = reading(sensor, ts, seq)
            seq += 1
            lines.append(dup)
    with open("data/sensor_readings.ndjson", "w") as f:
        for r in lines:
            f.write(json.dumps(r, separators=(",", ":")) + "\n")

    dirty = []
    for i in range(200):
        r = reading(random.choice(SENSORS), BASE_TS + i, 10000 + i)
        kind = i % 5
        if kind == 1:
            r["id"] = 999  # unknown sensor
        elif kind == 2:
            del r["H"]  # missing key
        elif kind == 3:
            r["extra"] = 1  # extra key
        dirty.append(json.dumps(r, separators=(",", ":")))
        if kind == 4:
            dirty[-1] = dirty[-1][:-5] + "@@@"  # malformed JSON
    with open("data/sensor_readings_dirty.ndjson", "w") as f:
        f.write("\n".join(dirty) + "\n")
    print(f"wrote {len(lines)} clean, {len(dirty)} dirty lines")


if __name__ == "__main__":
    main()
