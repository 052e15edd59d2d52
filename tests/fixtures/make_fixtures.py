"""Generate numeric parity fixtures from the reference implementation.

Loads torch-only modules of the read-only reference checkout standalone
(``/root/reference/celldetection/ops/cpn.py`` has no intra-package imports) and
records input/output pairs as .npz files. Run once; fixtures are committed.

Usage: python tests/fixtures/make_fixtures.py
"""
import importlib.util
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = '/root/reference/celldetection'


def load_standalone(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def extract_function(path, fn_name, namespace):
    """Exec a single top-level function's source in a given namespace."""
    import ast
    with open(path) as f:
        src = f.read()
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == fn_name:
            code = ast.get_source_segment(src, node)
            exec(compile(code, path, 'exec'), namespace)
            return namespace[fn_name]
    raise KeyError(fn_name)


def main():
    import torch
    torch.manual_seed(0)
    rng = np.random.RandomState(0)

    ref_cpn = load_standalone(os.path.join(REF, 'ops', 'cpn.py'), 'ref_ops_cpn')

    # --- fouriers2contours ---------------------------------------------------
    fourier = rng.randn(37, 5, 4).astype(np.float32) * 3
    locations = (rng.rand(37, 2).astype(np.float32) * 100)
    con, samp = ref_cpn.fouriers2contours(torch.from_numpy(fourier), torch.from_numpy(locations), samples=32)
    # custom sampling variant (per-contour samplings as used in training)
    sampling = np.sort(rng.rand(37, 24).astype(np.float32), -1)
    con2, _ = ref_cpn.fouriers2contours(torch.from_numpy(fourier), torch.from_numpy(locations),
                                        sampling=torch.from_numpy(sampling))
    np.savez(os.path.join(HERE, 'fouriers2contours.npz'),
             fourier=fourier, locations=locations, contours=con.numpy(),
             sampling=sampling, contours_sampled=con2.numpy())

    # --- rel_location2abs_location ------------------------------------------
    loc = rng.randn(2, 2, 13, 17).astype(np.float32)
    out = ref_cpn.rel_location2abs_location(torch.from_numpy(loc))
    np.savez(os.path.join(HERE, 'rel_location2abs_location.npz'), locations=loc, out=out.numpy())

    # --- scale_contours / scale_fourier -------------------------------------
    cons = rng.rand(11, 16, 2).astype(np.float32) * 64
    sc = ref_cpn.scale_contours((64, 48), (256, 192), torch.from_numpy(cons.copy()))
    f = rng.randn(11, 5, 4).astype(np.float32)
    l = rng.rand(11, 2).astype(np.float32) * 64
    sf, sl = ref_cpn.scale_fourier((64, 48), (256, 192), torch.from_numpy(f.copy()), torch.from_numpy(l.copy()))
    np.savez(os.path.join(HERE, 'scaling.npz'), contours=cons, scaled_contours=sc.numpy(),
             fourier=f, locations=l, scaled_fourier=sf.numpy(), scaled_locations=sl.numpy())

    # --- order_weighting, refinement buckets --------------------------------
    ow = ref_cpn.order_weighting(5).numpy()
    samplings = np.sort(rng.rand(7, 32).astype(np.float32), -1)
    buckets = ref_cpn.resolve_refinement_buckets(torch.from_numpy(samplings), 6)
    np.savez(os.path.join(HERE, 'weighting.npz'), order_weighting=ow, samplings=samplings,
             b0i=buckets[0][0].numpy(), b0w=buckets[0][1].numpy(),
             b1i=buckets[1][0].numpy(), b1w=buckets[1][1].numpy(),
             b2i=buckets[2][0].numpy(), b2w=buckets[2][1].numpy())

    # --- border/stitching filters -------------------------------------------
    cons = rng.rand(64, 12, 2).astype(np.float32) * 128
    keep = ref_cpn.remove_border_contours(torch.from_numpy(cons), (128, 128), padding=4,
                                          top=True, right=False, bottom=True, left=True)
    overlaps = np.array([[16, 32], [8, 24]], dtype=np.float32)
    keep2 = ref_cpn.filter_contours_by_stitching_rule(torch.from_numpy(cons), (128, 128),
                                                      torch.from_numpy(overlaps), rule='ex_br')
    np.savez(os.path.join(HERE, 'filters.npz'), contours=cons, keep_border=keep.numpy(),
             overlaps=overlaps, keep_stitch=keep2.numpy())

    # --- downsample_labels (ops/commons.py is torch-only too) ----------------
    ref_commons = load_standalone(os.path.join(REF, 'ops', 'commons.py'), 'ref_ops_commons')
    labels = rng.randint(0, 9, (2, 1, 64, 64)).astype(np.float32)
    ds = ref_commons.downsample_labels(torch.from_numpy(labels), [16, 16])
    ds2 = ref_commons.downsample_labels(torch.from_numpy(labels), [24, 24])  # non-divisible path
    np.savez(os.path.join(HERE, 'downsample_labels.npz'), labels=labels, out16=ds.numpy(), out24=ds2.numpy())

    # --- efd + fourier2contour (numpy functions from data/cpn.py) ------------
    ns = {'np': np}
    efd = extract_function(os.path.join(REF, 'data', 'cpn.py'), 'efd', ns)
    fourier2contour = extract_function(os.path.join(REF, 'data', 'cpn.py'), 'fourier2contour', ns)
    theta = np.linspace(0, 2 * np.pi, 50, endpoint=False)
    blob = np.stack([30 + 12 * np.cos(theta) + 3 * np.cos(3 * theta),
                     40 + 9 * np.sin(theta) + 2 * np.sin(2 * theta)], -1).astype(np.float64)
    coeffs, loc0 = efd(blob, order=6)
    recon = fourier2contour(coeffs, loc0, samples=64)
    np.savez(os.path.join(HERE, 'efd.npz'), contour=blob, coeffs=coeffs, location=loc0, recon=recon)

    # --- torch-equivalent bilinear resize (align_corners=False) --------------
    import torch.nn.functional as F
    x = rng.rand(1, 3, 16, 16).astype(np.float32)
    y = F.interpolate(torch.from_numpy(x), (37, 41), mode='bilinear', align_corners=False)
    np.savez(os.path.join(HERE, 'resize.npz'), x=x, y=y.numpy())

    print('fixtures written to', HERE)


if __name__ == '__main__':
    main()
