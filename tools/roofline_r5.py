"""Per-op-family roofline floors for the production BDM-B denoise step
(B=8, N=4096, PVCNN2_PC2, bf16, single v5e chip) against the measured
per-family times from the winning-config profile
(/tmp/bdm_prof_interp_mm, `tools/parse_xplane.py --agg`, 27.66 ms/step).

Floor model per family = max(FLOP time, HBM byte time, serial-start
time), where:
  * FLOP time  = FLOPs / (197 TFLOP/s bf16 peak) x MXU lane-utilization
    penalty (a matmul with Cout < 128 output columns uses Cout/128 of
    the 128-wide MXU; XLA/Mosaic pad the rest);
  * byte time  = unique HBM bytes moved / 819 GB/s;
  * start time = serial gather/scatter row starts x 7 ns (the measured
    XLA:CPU->TPU serial-gather floor, TODO.md r4 tail analysis — TPU
    gathers issue row-by-row from the sparse core / scalar unit).

Prints the table that docs/roofline_r5.md embeds.
"""

PEAK_TF = 197e12
HBM = 819e9
START_NS = 7e-9
B, N = 8, 4096


def us(x):
    return x * 1e6


def conv_flop_time(cells, cin, cout):
    fl = 2 * B * cells * 27 * cin * cout
    util = min(cout, 128) / 128.0
    return fl / (PEAK_TF * util)


rows = []

# ---- conv family ----------------------------------------------------
# site list: (name, cells=R^3, cin, cout)
conv_sites = [
    ("sa0 conv1 (mm-form, 390ch)", 32**3, 390, 32),
    ("sa0 conv2", 32**3, 32, 32),
    ("sa1 conv (R16)", 16**3, 67, 64),
    ("sa2 conv (R8)", 8**3, 131, 128),
    ("fp0 convs x3 (R8)", 8**3, 256, 256),
    ("fp1 convs x3 (R8)", 8**3, 256, 256),
    ("fp2 convs x2 (R16)", 16**3, 128, 128),
    ("fp3 convs x2 (R32)", 32**3, 64, 64),
]
mult = {"fp0 convs x3 (R8)": 3, "fp1 convs x3 (R8)": 3,
        "fp2 convs x2 (R16)": 2, "fp3 convs x2 (R32)": 2}
conv_floor = 0.0
for name, cells, cin, cout in conv_sites:
    m = mult.get(name, 1)
    ft = conv_flop_time(cells, cin, cout) * m
    bt = m * 2 * B * cells * (cin + cout) / HBM  # bf16 grid read+write
    conv_floor += max(ft, bt)
rows.append(("voxel convs (conv3d_ms + conv3d_mm)", 5723.6 + 1622.2,
             us(conv_floor),
             "FLOP-bound; <128-wide output columns idle MXU lanes"))

# ---- devoxelize window gathers -------------------------------------
# per PVConv site: (B*N, 2,2,2, C) window image built from 4 strided row
# gathers per point (2x2 in-slice rows x 2 D-slices fetched as one
# minor-dim-full row each)
devox_sites = [(32, 32), (32, 32), (16, 64), (8, 128),
               (8, 256), (8, 256), (8, 256), (8, 256), (8, 256), (8, 256),
               (16, 128), (16, 128), (32, 64), (32, 64)]
# point counts per site (stage point count)
devox_pts = [4096, 4096, 1024, 256, 64, 64, 64, 256, 256, 256,
             1024, 1024, 4096, 4096]
dv_floor = 0.0
for (r, c), pts in zip(devox_sites, devox_pts):
    starts = B * pts * 4
    st = starts * START_NS
    bt = B * pts * 8 * c * 2 / HBM
    dv_floor += max(st, bt)
rows.append(("devox window gathers", 1299.0 + 1298.5 + 147.3 + 130.8,
             us(dv_floor), "start-bound: 4 serial row starts per point"))

# ---- SA grouping gathers -------------------------------------------
group_sites = [(1024, 32, 35), (256, 32, 67), (64, 32, 131), (16, 32, 259)]
g_floor = 0.0
for m, k, c in group_sites:
    starts = B * m * k
    st = starts * START_NS
    bt = B * m * k * c * 2 / HBM
    g_floor += max(st, bt)
rows.append(("SA grouping gathers", 1736.9 + 434.4 + 117.3,
             us(g_floor), "start-bound: one row start per (center, nbr)"))

# ---- voxelize scatter ----------------------------------------------
# sorted segment-sum over B*N contribution rows per site, bf16 payload
sc_floor = 0.0
for (r, c), pts in zip(devox_sites, devox_pts):
    bt = B * pts * c * 2 * 2 / HBM      # read rows + write grid
    st = B * pts / 8 * START_NS         # sorted: 8-row segments coalesce
    sc_floor += max(st, bt)
rows.append(("voxelize scatter (sorted segment-sum)", 1272.8 + 1025.4,
             us(sc_floor), "sorted runs amortize starts 8x"))

# ---- FPS ------------------------------------------------------------
# inherently serial: M dependent iterations, each a full-N distance
# update (VPU) + argmax; latency ~0.55 us/iter measured in isolation
fps_floor = 1024 * 0.55
rows.append(("furthest point sampling", 663.9, fps_floor,
             "serial by definition: M dependent argmax rounds"))

# ---- 3-NN + interp --------------------------------------------------
rows.append(("3-NN + FP interp (one-hot matmul)", 781.9 + 102.7,
             us(2 * 8 * (4096 * 1024 + 1024 * 256 + 256 * 64) * 3 * 2
                / PEAK_TF) + 150,
             "distance matrices are tiny; top-3 extract is VPU-serial"))

# ---- attention ------------------------------------------------------
rows.append(("voxel attention (blocked pallas)", 449.8,
             us(2 * 2 * 8 * (4096 * 4096 * 32 + 512 * 512 * 128) * 2
                / PEAK_TF),
             "S=4096 C=32 + S=512 C=128 sites, QK^T + AV"))

# ---- ball query -----------------------------------------------------
rows.append(("ball query", 93.6 + 1146.8 - 1146.8, 80,
             "O(M*N) compare + first-K extract, VPU-bound"))

# ---- GN / elementwise / layout tail --------------------------------
tail_meas = (504.8 + 434.6 + 283.9 + 233.6 + 232.6 + 226.6 + 217.3
             + 181.5 + 179.7)
# bytes: every listed fusion reads+writes its tensor once
tail_bytes = sum([
    32768 * 387 * 2 * 2, 32768 * 64 * 2 * 2, 32768 * 390 * 2 * 2,
    8 * 36 * 1024 * 64 * 2 * 2, 8 * 36 * 1024 * 32 * 2 * 2,
    32768 * 4 * 4 * 2, 32768 * 32 * 2 * 2,
    8 * 32768 * 64 * 2 * 2, 8 * 32768 * 32 * 2 * 2,
])
rows.append(("GN stats / elementwise / layout fusions", tail_meas,
             us(tail_bytes / HBM), "HBM-bound elementwise passes"))

meas_total = sum(r[1] for r in rows)
floor_total = sum(r[2] for r in rows)
print(f"{'family':44s} {'meas us':>9s} {'floor us':>9s} {'gap':>5s}")
for name, meas, floor, note in rows:
    print(f"{name:44s} {meas:9.0f} {floor:9.0f} {meas/floor:4.1f}x  {note}")
print(f"{'SUM (profiled families)':44s} {meas_total:9.0f} "
      f"{floor_total:9.0f} {meas_total/floor_total:4.1f}x")
print(f"step total 27661 us; unattributed tail = "
      f"{27661 - meas_total:.0f} us (scheduler math, while-loop "
      f"dispatch, small copies)")
