"""Deterministic synthetic data: historical addresses + conversation transcripts.

Shapes per FIXTURES.md:
- ``addresses``  (F5-analog, the "historical address DB" the reference links
  against): ``addr_id:int64, text:string, grid_id:string``;
- ``transcripts`` (F2, exact shape from BASELINE.json input_hint):
  ``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp``;
- ``mentions_truth`` (eval-only, never fed to the pipeline):
  ``conv_id:string, turn_idx:int32, addr_id:int64``.

Everything is seeded (seed=42 fixed) and scale-parameterized; regeneration is
byte-stable so the oracle and the pipeline see identical per-turn text (the
per-turn text equality invariant). Hot-key skew is built in: a few hot
districts receive a large share of addresses and a few hot conversations are
hundreds of turns long (exercises salting / block-splitting).
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernel.regions import RegionDict
from ..kernel.types import RegionType

SEED = 42

ROADS = [
    "人民路", "解放路", "中山大道", "建设大道", "幸福街", "和平路", "文化路",
    "朝阳街", "前进路", "东风路", "南京路", "北京大道", "长江路", "黄河街",
    "青年路", "胜利街", "光明路", "新华路", "育才街", "工业大道", "滨河路",
    "花园街", "学府路", "金水路", "迎宾大道",
]
VILLAGES = [  # rural village segments (not in the region dict -> minable, P8)
    "马家村", "王家村", "李家村", "赵家村", "周家村", "陈家村", "杨柳村",
    "石桥村", "柳林村", "梅花村",
]
TOWNSHIPS = ["青山镇", "柳河镇", "白水乡", "梅岭乡"]  # likewise minable
COMMUNITIES = [
    "阳光花园", "翠微小区", "锦绣家园", "金色港湾", "绿城广场", "丽景天成",
    "紫荆公寓", "万象新城", "香樟雅苑", "清华园", "碧水云天", "康庄小区",
    "龙湖花园", "书香门第", "石榴庄园", "凤凰名城",
]
CHITCHAT = [
    "好的，明天见。", "请问今天营业吗？", "谢谢你的帮助！", "订单已经发出了吗？",
    "麻烦尽快处理一下。", "稍等，我查一下。", "没问题，这就安排。",
    "please confirm the order status", "ok thanks, ship it today",
]
TEMPLATES = [
    "请把包裹寄到{a}，谢谢。",
    "我现在在{a}，马上出发。",
    "收货地址改成{a}可以吗？",
    "师傅，送到{a}门口就行。",
    "地址是{a}，电话13812345678。",
    "帮我查一下{a}附近的网点。",
    "{a}",
    "新地址：{a}（工作日白天有人）。",
]
_BASE_TS = datetime(2024, 1, 1, 8, 0, 0)


def _usable_districts(region_dict: RegionDict):
    """Districts with a resolvable province+city chain, with their street children."""
    out = []
    for r in region_dict.by_id.values():
        if r.type not in (RegionType.DISTRICT, RegionType.CITY_LEVEL_DISTRICT):
            continue
        city = region_dict.get(r.parent_id)
        if city is None:
            continue
        prov = region_dict.get(city.parent_id)
        if prov is None or prov.type not in (RegionType.PROVINCE, RegionType.PROVINCE_LEVEL_CITY1):
            continue
        streets = [c for c in (r.children or []) if c.type == RegionType.STREET]
        out.append((prov, city, r, streets))
    out.sort(key=lambda t: t[2].id)  # deterministic order
    return out


def generate_addresses(region_dict: RegionDict, n_addresses: int, seed: int = SEED):
    """Historical address corpus with zipf-skewed district popularity."""
    rng = random.Random(seed)
    districts = _usable_districts(region_dict)
    n_districts = max(10, min(len(districts), n_addresses // 12))
    chosen = rng.sample(districts, n_districts)
    # zipf-ish weights: first few districts are hot keys
    weights = [1.0 / (i + 1) ** 0.8 for i in range(n_districts)]

    rows = {"addr_id": [], "text": [], "grid_id": []}
    seen = set()
    addr_id = 0
    while addr_id < n_addresses:
        prov, city, dist, streets = rng.choices(chosen, weights)[0]
        street = rng.choice(streets) if streets and rng.random() < 0.8 else None
        road = rng.choice(ROADS)
        num = rng.randint(1, 180)
        community = rng.choice(COMMUNITIES)
        bldg = f"{rng.randint(1, 30)}号楼{rng.randint(1, 6)}单元{rng.randint(101, 2604)}室"
        parts = [prov.name, city.name]
        if dist.id != city.id:
            parts.append(dist.name)
        if street is not None:
            parts.append(street.name)
        if rng.random() < 0.15:  # rural shape: minable township/village segment
            if rng.random() < 0.4:
                parts.append(rng.choice(TOWNSHIPS))
            parts.append(rng.choice(VILLAGES))
        parts += [road, f"{num}号", community, bldg]
        text = "".join(parts)
        if text in seen:
            continue
        seen.add(text)
        rows["addr_id"].append(addr_id)
        rows["text"].append(text)
        rows["grid_id"].append(f"G{dist.id}-{addr_id % 97:02d}")
        addr_id += 1

    return pa.table({
        "addr_id": pa.array(rows["addr_id"], pa.int64()),
        "text": pa.array(rows["text"], pa.string()),
        "grid_id": pa.array(rows["grid_id"], pa.string()),
    })


_CJK_DIGITS = "零一二三四五六七八九"


def _variant(text: str, rng: random.Random) -> str:
    """Render a noisy variant of a canonical address (same linkable core)."""
    t = text
    r = rng.random()
    if r < 0.25 and t.endswith("室"):
        t = t[: t.rfind("号楼") + 2] if "号楼" in t else t  # drop unit/room detail
    if rng.random() < 0.3:
        # drop the province prefix (interpreter tolerates it)
        for suffix in ("省", "自治区"):
            idx = t.find(suffix)
            if 0 < idx <= 4:
                t = t[idx + len(suffix):]
                break
    if rng.random() < 0.2:
        t = t.replace("号楼", "#", 1)
    if rng.random() < 0.15:
        t = t + rng.choice(["附近", "对面", "东门", "门口"])
    return t


def generate_transcripts(addresses: pa.Table, n_turns: int, seed: int = SEED):
    """Conversations embedding noisy variants of corpus addresses."""
    rng = random.Random(seed + 1)
    addr_texts = addresses.column("text").to_pylist()
    addr_ids = addresses.column("addr_id").to_pylist()
    n_addr = len(addr_texts)

    cols = {"conv_id": [], "turn_idx": [], "role": [], "text": [], "tool": [], "ts": []}
    truth = {"conv_id": [], "turn_idx": [], "addr_id": []}

    turns_made = 0
    conv_no = 0
    while turns_made < n_turns:
        conv_id = f"c{conv_no:07d}"
        # hot-key skew: ~1% of conversations are very long
        if rng.random() < 0.01:
            conv_len = rng.randint(150, 400)
        else:
            conv_len = rng.randint(2, 40)
        ts = _BASE_TS + timedelta(minutes=conv_no * 7)
        for turn_idx in range(conv_len):
            role = ("user", "assistant", "tool")[
                0 if turn_idx % 2 == 0 else (2 if rng.random() < 0.08 else 1)
            ]
            tool = "geocode" if role == "tool" else None
            if rng.random() < 0.45 and role != "tool":
                k = rng.randrange(n_addr)
                mention = _variant(addr_texts[k], rng)
                text = rng.choice(TEMPLATES).format(a=mention)
                truth["conv_id"].append(conv_id)
                truth["turn_idx"].append(turn_idx)
                truth["addr_id"].append(addr_ids[k])
            elif role == "tool":
                text = f'{{"status": "ok", "lat": {rng.randint(20, 45)}.{rng.randint(0, 999999):06d}}}'
            else:
                text = rng.choice(CHITCHAT)
            cols["conv_id"].append(conv_id)
            cols["turn_idx"].append(turn_idx)
            cols["role"].append(role)
            cols["text"].append(text)
            cols["tool"].append(tool)
            cols["ts"].append(ts + timedelta(seconds=turn_idx * 13))
            turns_made += 1
            if turns_made >= n_turns:
                break
        conv_no += 1

    transcripts = pa.table({
        "conv_id": pa.array(cols["conv_id"], pa.string()),
        "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
        "role": pa.array(cols["role"], pa.string()),
        "text": pa.array(cols["text"], pa.string()),
        "tool": pa.array(cols["tool"], pa.string()),
        "ts": pa.array(cols["ts"], pa.timestamp("us")),
    })
    truth_t = pa.table({
        "conv_id": pa.array(truth["conv_id"], pa.string()),
        "turn_idx": pa.array(truth["turn_idx"], pa.int32()),
        "addr_id": pa.array(truth["addr_id"], pa.int64()),
    })
    return transcripts, truth_t


def _write_regression_csv(addresses: pa.Table, path: str, seed: int):
    """Labeled 7-field quoted-CSV regression file (F5; format per
    misc/RegressionTestImportWLData.java:29,96-103). The first three fields
    are the address's own leading components re-split coarsely; ``detail`` is
    a noisy variant; ``grid_id`` is the label the linker must recover."""
    rng = random.Random(seed)
    lines = []
    texts = addresses.column("text").to_pylist()
    grids = addresses.column("grid_id").to_pylist()
    ids = addresses.column("addr_id").to_pylist()
    for addr_id, text, grid in zip(ids, texts, grids):
        if rng.random() > 0.25:  # a sample, like a labeled eval set
            continue
        variant = _variant(text, rng)
        ts = (_BASE_TS + timedelta(minutes=addr_id * 3)).strftime("%m/%d/%Y %H:%M:%S")
        if rng.random() < 0.05:
            ts = "bogus-date"  # exercises the 1900-01-01 default path
        lines.append(f'"O{addr_id:06d}","","","","{variant}","{ts}","{grid}"')
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


# -- cached materialization --------------------------------------------------

def scale_for_sf(sf: float) -> tuple[int, int]:
    """(n_addresses, n_turns) for a TPC-H-ish scale factor.

    sf0.1 -> 20k historical addresses / 200k transcript turns (the bench
    scale); sf0.01 -> 2k/20k (correctness gate); sf0.001 -> 200/2k (pytest)."""
    return max(200, int(200_000 * sf)), max(2_000, int(2_000_000 * sf))


def dataset_dir(sf: float, root: str = "/tmp/asr_synth", multiplier: float = 1.0) -> str:
    suffix = "" if multiplier == 1.0 else f"x{multiplier:g}"
    return os.path.join(root, f"sf{sf:g}{suffix}")


def ensure_dataset(sf: float, root: str = "/tmp/asr_synth",
                   region_dict_path: str | None = None, multiplier: float = 1.0) -> str:
    """Generate (once) and return the directory holding the three tables.

    ``multiplier`` scales the TURN count only (bench uses 10x so parallel
    work dominates fixed costs; the address corpus stays the small side)."""
    out = dataset_dir(sf, root, multiplier)
    marker = os.path.join(out, "_SUCCESS")
    n_addr, n_turns = scale_for_sf(sf)
    n_turns = int(n_turns * multiplier)
    stamp = f"{SEED}:{n_addr}:{n_turns}:v5"
    if os.path.exists(marker) and open(marker).read() == stamp:
        return out
    if region_dict_path is None:
        region_dict_path = os.path.join(os.path.dirname(__file__), "region_dict.parquet")
    rd = RegionDict.from_parquet(region_dict_path)
    addresses = generate_addresses(rd, n_addr)
    transcripts, truth = generate_transcripts(addresses, n_turns)
    os.makedirs(out, exist_ok=True)
    # Tables are DIRECTORIES of part files (the realistic at-scale input
    # shape): a multi-file read parallelizes across Ray read tasks with no
    # repartition barrier — a single parquet file reads in ONE serial task
    # that starves the downstream actor pool for its first ~5 s.
    _write_parts(addresses, os.path.join(out, "addresses.parquet"),
                 target_rows=1024)
    _write_regression_csv(addresses, os.path.join(out, "regression.csv"), seed=SEED + 2)
    _write_parts(transcripts, os.path.join(out, "transcripts.parquet"),
                 target_rows=8192)
    pq.write_table(truth, os.path.join(out, "mentions_truth.parquet"))
    with open(marker, "w") as f:
        f.write(stamp)
    return out


def _write_parts(table: pa.Table, dir_path: str, target_rows: int) -> None:
    """Write a table as dir_path/part-NNNNN.parquet (>= 4 parts)."""
    import shutil

    if os.path.isfile(dir_path):  # stale single-file layout from v4
        os.remove(dir_path)
    shutil.rmtree(dir_path, ignore_errors=True)
    os.makedirs(dir_path, exist_ok=True)
    n = table.num_rows
    n_parts = max(4, min(512, (n + target_rows - 1) // target_rows))
    per = (n + n_parts - 1) // n_parts
    for i in range(n_parts):
        chunk = table.slice(i * per, per)
        if chunk.num_rows == 0:
            break
        pq.write_table(chunk, os.path.join(dir_path, f"part-{i:05d}.parquet"))
