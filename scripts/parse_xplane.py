"""Extract per-HLO-op self times from a jax.profiler trace directory.

Uses tensorboard-plugin-profile's xspace converters (installed in this
image) to turn the .xplane.pb capture into an hlo_stats / op_profile
table, then prints the top-N ops by self time — the op-level attribution
the roofline deltas can't give.

Usage: python scripts/parse_xplane.py <trace_dir> [top_n]
"""

import glob
import json
import sys


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {trace_dir}")
    path = paths[-1]
    print(f"parsing {path}", file=sys.stderr)

    try:  # xprof first: the old tensorboard_plugin_profile 2.13 protos
        # are incompatible with the installed protobuf
        from xprof.convert import raw_to_tool_data as raw_to_tools_data
    except (ImportError, TypeError):
        from tensorboard_plugin_profile.convert import (
            raw_to_tool_data as raw_to_tools_data)

    for tool in ("hlo_stats", "op_profile", "framework_op_stats",
                 "kernel_stats"):
        try:
            data, ctype = raw_to_tools_data.xspace_to_tool_data(
                [path], tool, {})
        except Exception as e:  # noqa: BLE001 - tool support varies
            print(f"[{tool}] failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        print(f"=== {tool} (content type {ctype}) ===")
        if isinstance(data, bytes):
            try:
                data = data.decode()
            except UnicodeDecodeError:
                print(f"[{tool}] binary payload {len(data)} B, skipping")
                continue
        if tool == "hlo_stats":
            try:
                obj = json.loads(data)
            except json.JSONDecodeError:
                print(data[:2000])
                continue
            # gviz table: {cols: [...], rows: [{c: [{v: ...}...]}...]}
            cols = [c.get("label", c.get("id", "?"))
                    for c in obj.get("cols", [])]
            rows = obj.get("rows", [])
            print("columns:", cols)
            # find a self-time column to sort by
            key_idx = None
            for i, c in enumerate(cols):
                if "self" in c.lower() and "time" in c.lower():
                    key_idx = i
                    break
            vals = []
            for r in rows:
                cells = [c.get("v") if isinstance(c, dict) else c
                         for c in r.get("c", [])]
                vals.append(cells)
            if key_idx is not None:
                vals.sort(key=lambda c: -(c[key_idx] or 0))
            for cells in vals[:top_n]:
                print(cells)
            return
        print(str(data)[:4000])


if __name__ == "__main__":
    main()
