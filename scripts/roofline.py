"""Roofline / MFU accounting for the headline bench step (VERDICT r3 #1b).

Computes, with checkable arithmetic and no device:

  1. USEFUL FLOPs per model pass (reference semantics: every conv's
     2*K*K*Cin*Cout*Hout*Wout MACs) for the encoder + disp0 decoder at
     the bench shapes — full frame 320x1024 and the 320x256 attack crop.
  2. EXECUTED FLOPs for the best known exact formulation of each stage
     on a 128x128-lane MXU:
       - plain NHWC conv: both channel operands pad up to the 128-lane
         tile, so executed = useful * (pad(Cin)/Cin) * (pad(Cout)/Cout)
         (64-channel stages run 2x2=4x padded FLOPs, 16-channel 8x8=64x);
       - width-packed decoder stages (ops/wpack_decoder.py): the 3x3
         reflect conv is EXACT as a 3x2 phase-blocked conv on
         (B,H,W/f,f*C), executed = useful * (3*2*f)/(3*3) = 2f/3 with
         full lanes at f*C = 128 — the measured-optimal f schedule
         (f=2 at 64ch entry, 4, 8 at the 16ch full-res stages);
       - the s2d/wpack stem: 7x7/s2 on Cin=3 -> 4x4 phase convs on
         s2d-packed Cin=48 (pad to 128).
  3. Speed-of-light step times at the v5e bf16 MXU peak (197 TFLOP/s)
     for the bench step composition:
         10 x (fwd + input-grad bwd) at the crop
       + final tiled pair composite (non-conv)
       + teacher fwd (full frame)
       + student fwd + full bwd (full frame, train mode)
     input-grad bwd executes ~= 1x fwd conv FLOPs (transposed convs);
     full bwd ~= 2x fwd (input grads + kernel grads).

Usage: python scripts/roofline.py [--step-ms MEASURED]
"""

import argparse

PEAK_BF16 = 197e12  # v5e MXU peak, FLOP/s
LANE = 128


def pad(c: int) -> int:
    return ((c + LANE - 1) // LANE) * LANE


def conv(name, k, cin, cout, hout, wout, formulation="plain", f=None):
    """Returns dict with useful/executed MACs for one conv layer."""
    useful = k * k * cin * cout * hout * wout
    if formulation == "plain":
        executed = k * k * pad(cin) * pad(cout) * hout * wout
    elif formulation == "wpack":
        # 3x2 phase-blocked kernel on (W/f, f*C): executed MACs
        # = 3*2*(f*cin)*(f*cout)*hout*(wout/f) = useful * 2f/3 at k=3
        assert k == 3 and f
        executed = 3 * 2 * (f * cin) * (f * cout) * hout * (wout // f)
        executed = max(executed,
                       3 * 2 * pad(f * cin) * pad(f * cout)
                       * hout * (wout // f))
    elif formulation == "stem":
        # SHIPPED lhs-dilated s2d8 stem (ops/wpack_encoder.py:
        # s2d8_stem_conv_dilated, ADVICE r4 #1): XLA phase-decomposes
        # the row-dilated kernel into two (3,2,128,256) phase convs
        # over the left-shifted 4x8-s2d input (4*8*4 = 128 FULL input
        # lanes incl. the folded-normalization ones channel), each
        # emitting one row phase of the f=4 width-packed stem
        # (W/8 + 1 packed columns, 4*cout = 256 output lanes).
        executed = (2 * 3 * 2 * pad(128) * pad(4 * cout)
                    * (hout // 2) * (wout // 4 + 1))
    elif formulation == "tapsplit":
        # single-output-channel disparity head (ops/wpack_decoder.py
        # wpack_dispconv): ONE 1x1 matmul produces all nine per-tap
        # channel contractions (9f = 72 output lanes at f=8) + nine
        # VPU shifted adds — no 3x2 phase conv, no Cout=1 -> 128
        # output-lane pad.
        assert k == 3 and f and cout == 1
        executed = pad(f * cin) * pad(9 * f) * hout * (wout // f)
    else:
        raise ValueError(formulation)
    return {"name": name, "useful": useful, "executed": executed}


def encoder_layers(H, W):
    """ResNet-18 encoder convs at input (H, W)."""
    L = [conv("stem7x7", 7, 3, 64, H // 2, W // 2, "stem")]
    # layer1: 4x 3x3 64->64 @ /4, width-packed at f=2 (PackedBasicBlock:
    # 128 full lanes both sides, kernel33 3x3 over W/2 packed columns
    # = half the plain-NHWC executed FLOPs)
    for i in range(4):
        L.append(conv(f"l1_c{i}", 3, 64, 64, H // 4, W // 4,
                      "wpack", f=2))
    # layers 2-4: [3x3 s2 cin->cout, 3x3, 1x1 ds, 3x3, 3x3]
    for li, (cin, cout, s) in enumerate(
            [(64, 128, 8), (128, 256, 16), (256, 512, 32)], start=2):
        h, w = H // s, W // s
        L.append(conv(f"l{li}_c0", 3, cin, cout, h, w))
        L.append(conv(f"l{li}_c1", 3, cout, cout, h, w))
        L.append(conv(f"l{li}_ds", 1, cin, cout, h, w))
        L.append(conv(f"l{li}_c2", 3, cout, cout, h, w))
        L.append(conv(f"l{li}_c3", 3, cout, cout, h, w))
    return L


def decoder_layers(H, W, scales=(0,), tapsplit=None):
    """Monodepth2 decoder convs (disp0-only twin), wpack schedule for
    stages 1/0 as shipped (models/depth_decoder.py:_call_wpacked).
    tapsplit: disp0 formulation; default = the shipped M>=64 switch
    (tap-split at full frames, phase conv at the attack crop)."""
    L = [
        conv("up4_0", 3, 512, 256, H // 32, W // 32),
        conv("up4_1", 3, 512, 256, H // 16, W // 16),
        conv("up3_0", 3, 256, 128, H // 16, W // 16),
        conv("up3_1", 3, 256, 128, H // 8, W // 8),
        conv("up2_0", 3, 128, 64, H // 8, W // 8),
        conv("up2_1", 3, 128, 64, H // 4, W // 4),
        # packed entry f=2 (64ch -> 128 lanes)
        conv("up1_0", 3, 64, 32, H // 4, W // 4, "wpack", f=2),
        # fused up2conv: main path reads f=2 pre-upsample input
        # (executed at the pre-up H/4 resolution x4 output positions
        # == f=4 at H/2), skip conv f=4
        conv("up1_1m", 3, 32, 32, H // 2, W // 2, "wpack", f=4),
        conv("up1_1s", 3, 64, 32, H // 2, W // 2, "wpack", f=4),
        conv("up0_0", 3, 32, 16, H // 2, W // 2, "wpack", f=4),
        conv("up0_1", 3, 16, 16, H, W, "wpack", f=8),
    ]
    if 0 in scales:
        ts = (W // 8 >= 64) if tapsplit is None else tapsplit
        L.append(conv("disp0", 3, 16, 1, H, W,
                      "tapsplit" if ts else "wpack", f=8))
    return L


def total(layers, key):
    return sum(x[key] for x in layers)


def gflop(macs):
    return 2 * macs / 1e9


def report(step_ms=None, batch=32):
    full = encoder_layers(320, 1024) + decoder_layers(320, 1024)
    crop = encoder_layers(256, 320) + decoder_layers(256, 320)

    print("== per-image model pass (encoder + disp0 decoder) ==")
    for nm, L in (("full 320x1024", full), ("crop 256x320", crop)):
        u, e = gflop(total(L, "useful")), gflop(total(L, "executed"))
        print(f"  {nm}: useful {u:7.2f} GFLOP   executed "
              f"{e:7.2f} GFLOP   (pad overhead {e/u:4.2f}x)")

    print("\n== top executed layers, full frame ==")
    for x in sorted(full, key=lambda x: -x["executed"])[:8]:
        print(f"  {x['name']:8s} useful {gflop(x['useful']):6.2f}  "
              f"executed {gflop(x['executed']):6.2f} GFLOP")

    # step composition (per image)
    u_full = gflop(total(full, "useful"))
    e_full = gflop(total(full, "executed"))
    u_crop = gflop(total(crop, "useful"))
    e_crop = gflop(total(crop, "executed"))
    comp = [
        ("PGD 10x (fwd + input bwd) @crop", 10 * 2 * u_crop,
         10 * 2 * e_crop),
        ("teacher fwd @full", u_full, e_full),
        ("student fwd + full bwd @full", 3 * u_full, 3 * e_full),
    ]
    print("\n== bench step composition (per image) ==")
    tu = te = 0.0
    for nm, u, e in comp:
        tu += u
        te += e
        print(f"  {nm:36s} useful {u:7.1f}  executed {e:7.1f} GFLOP")
    print(f"  {'TOTAL conv FLOPs':36s} useful {tu:7.1f}  "
          f"executed {te:7.1f} GFLOP")

    sol_u = batch * tu * 1e9 / PEAK_BF16 * 1e3
    sol_e = batch * te * 1e9 / PEAK_BF16 * 1e3
    print(f"\n== speed of light (batch {batch}, {PEAK_BF16/1e12:.0f}"
          f" TFLOP/s bf16 peak) ==")
    print(f"  useful-FLOP SoL:   {sol_u:6.1f} ms/step "
          f"-> {batch/(sol_u/1e3):6.1f} imgs/s ceiling")
    print(f"  executed-FLOP SoL: {sol_e:6.1f} ms/step "
          f"-> {batch/(sol_e/1e3):6.1f} imgs/s ceiling")
    if step_ms:
        print(f"\n  measured step: {step_ms:.1f} ms "
              f"({batch/(step_ms/1e3):.1f} imgs/s)")
        print(f"  useful-FLOP MFU:   {sol_u/step_ms*100:5.1f} %")
        print(f"  executed-FLOP MXU utilization: "
              f"{sol_e/step_ms*100:5.1f} %")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=None)
    ap.add_argument("--batch", type=int, default=32)
    a = ap.parse_args()
    report(a.step_ms, a.batch)
