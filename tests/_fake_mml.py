"""Fake MyMediaLite ``item_recommendation`` CLI for contract tests.

The real Mono binary is absent; the adapter layer
(``polara_tpu/models/external/mymedialite.py``) owns the train-CSV dump,
the command assembly, the text-model parsing and the internal→framework
factor remapping — THAT is what these tests cover.  ``install`` writes an
executable python script into a temp "library" dir; the script consumes
the wrapper's exact CLI surface and emits model/mapping files in
MyMediaLite's documented text layout:

* two header lines, then ``nu nf``, then nu*nf ``i f value`` rows;
* no-bias models follow with ``ni nf`` + ni*nf rows;
* bias models (BPRMF) follow with ``ni`` + ni bias rows + ``ni nf`` +
  ni*nf rows (matches ``parse_mml_model``'s two accepted layouts, which
  mirror reference ``mmlwrapper.py:124-143``).

Factor values encode their target coordinates (user: old_id + f/100,
item: 2*old_id + f/100, bias: 1000 + old_id) so tests can assert exact
placement after the id remapping; the id mapping is written in REVERSED
entity order to make misaligned remaps fail loudly.
"""
import os
import stat

_SCRIPT = r'''#!/usr/bin/env python3
import sys

args = {}
for arg in sys.argv[1:]:
    if arg.startswith("--") and "=" in arg:
        key, _, value = arg[2:].partition("=")
        args[key] = value
    else:
        args[arg.lstrip("-")] = True

rows = []
with open(args["training-file"]) as handle:
    for line in handle:
        line = line.strip()
        if line:
            parts = line.split(",")
            rows.append((int(parts[0]), int(parts[1])))

options = args.get("recommender-options", "").strip('"')
nf = 4
for opt in options.split():
    key, _, value = opt.partition("=")
    if key == "num_factors":
        nf = int(value)
algo = args.get("recommender", "BPRMF")
with_biases = algo.upper() == "BPRMF"

def order(ids):
    # reversed order: internal id 0 = LARGEST original id, so a remap
    # that ignores the mapping files cannot accidentally pass
    return sorted(set(ids), reverse=True)

users = order(r[0] for r in rows)
items = order(r[1] for r in rows)

if "no-id-mapping" in args:
    # ids used as-is; factor blocks cover the full contiguous range
    users = list(range(max(r[0] for r in rows) + 1))
    items = list(range(max(r[1] for r in rows) + 1))
else:
    with open(args["save-user-mapping"], "w") as handle:
        for internal, original in enumerate(users):
            handle.write(f"{internal}\t{original}\n")
    with open(args["save-item-mapping"], "w") as handle:
        for internal, original in enumerate(items):
            handle.write(f"{internal}\t{original}\n")

with open(args["save-model"], "w") as handle:
    handle.write("0.11\n")
    handle.write(f"{algo} fake model\n")
    handle.write(f"{len(users)} {nf}\n")
    for internal, original in enumerate(users):
        for f in range(nf):
            handle.write(f"{internal} {f} {original + f / 100:.6f}\n")
    if with_biases:
        handle.write(f"{len(items)}\n")
        for original in items:
            handle.write(f"{1000 + original:.6f}\n")
    handle.write(f"{len(items)} {nf}\n")
    for internal, original in enumerate(items):
        for f in range(nf):
            handle.write(f"{internal} {f} {2 * original + f / 100:.6f}\n")
sys.exit(0)
'''


def install(library_dir) -> str:
    """Write the fake ``item_recommendation`` executable into
    ``library_dir`` and return that path (the wrapper's
    ``library_path``)."""
    library_dir = str(library_dir)
    os.makedirs(library_dir, exist_ok=True)
    program = os.path.join(library_dir, "item_recommendation")
    with open(program, "w") as handle:
        handle.write(_SCRIPT)
    os.chmod(program, os.stat(program).st_mode | stat.S_IXUSR
             | stat.S_IXGRP | stat.S_IXOTH)
    return library_dir
