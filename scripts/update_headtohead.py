"""Merge new head-to-head seed runs into HEADTOHEAD.json (round 5).

Reads the per-run artifacts written by ``scripts/run_h2h_batch.sh``
(``/tmp/h2h_r5_{native,refinit}<seed>/tpu_results.json``), appends them to the
matching arm, recomputes aggregates with mean ± standard error per arm, and
rewrites the conclusion so it follows from the aggregates alone (VERDICT r4
item 3: n>=10 per TPU arm, no best-single-run framing).
"""
import glob
import json
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FN = os.path.join(ROOT, 'HEADTOHEAD.json')


def arm_stats(runs):
    f1 = np.array([r['f1_np'] for r in runs], np.float64)
    iou09 = np.array([float(r['per_iou']['0.9']) for r in runs], np.float64)
    return {
        'n': len(runs),
        'mean_f1': round(float(f1.mean()), 4),
        'std_f1': round(float(f1.std(ddof=1)), 4) if len(runs) > 1 else None,
        'se_f1': round(float(f1.std(ddof=1) / np.sqrt(len(f1))), 4) if len(runs) > 1 else None,
        'mean_iou09': round(float(iou09.mean()), 4),
        'se_iou09': round(float(iou09.std(ddof=1) / np.sqrt(len(f1))), 4) if len(runs) > 1 else None,
        'seeds': sorted(int(r['seed']) for r in runs),
    }


def main():
    with open(FN) as f:
        d = json.load(f)

    for arm, pattern in (('tpu_native_init', '/tmp/h2h_r5_native*/tpu_results.json'),
                         ('tpu_reference_init', '/tmp/h2h_r5_refinit*/tpu_results.json')):
        have = {(r['seed'], bool(r.get('ref_init'))) for r in d['runs'][arm]}
        for fn in sorted(glob.glob(pattern)):
            with open(fn) as f:
                r = json.load(f)
            key = (r['seed'], bool(r.get('ref_init')))
            if key in have or r['seed'] in {s for s, _ in have}:
                print('skip duplicate seed', arm, r['seed'])
                continue
            entry = {'seed': r['seed'], 'f1_np': round(r['f1_np'], 4),
                     'per_iou': r['per_iou'], 'train_seconds': r['train_seconds'],
                     'steps': r['steps'], 'precision': r.get('precision', 'default')}
            d['runs'][arm].append(entry)
            print('added', arm, 'seed', r['seed'], 'f1', entry['f1_np'])

    nat = arm_stats(d['runs']['tpu_native_init'])
    ref_init = arm_stats(d['runs']['tpu_reference_init'])
    ref = arm_stats(d['runs']['reference'])
    agg = d['aggregates']
    agg['tpu_native_init_mean_f1'] = nat['mean_f1']
    agg['tpu_native_init_std_f1'] = nat['std_f1']
    agg['tpu_native_init_se_f1'] = nat['se_f1']
    agg['tpu_native_init_n'] = nat['n']
    agg['tpu_native_init_mean_iou09'] = nat['mean_iou09']
    agg['tpu_reference_init_mean_f1'] = ref_init['mean_f1']
    agg['tpu_reference_init_std_f1'] = ref_init['std_f1']
    agg['tpu_reference_init_se_f1'] = ref_init['se_f1']
    agg['tpu_reference_init_n'] = ref_init['n']
    agg['tpu_reference_init_mean_iou09'] = ref_init['mean_iou09']
    agg['arms'] = {'tpu_native_init': nat, 'tpu_reference_init': ref_init,
                   'reference_torch_cpu': ref}
    arm_delta = round(nat['mean_f1'] - ref_init['mean_f1'], 4)
    pooled_se = round(float(np.hypot(nat['se_f1'] or 0, ref_init['se_f1'] or 0)), 4)
    agg['native_minus_matched_init_f1'] = arm_delta
    agg['native_minus_matched_init_pooled_se'] = pooled_se
    agg.pop('best_single_run', None)  # cherry-adjacent framing (VERDICT r4)

    z = arm_delta / pooled_se if pooled_se else float('nan')
    d['conclusion'] = (
        f"Arms at n={nat['n']} (native init) and n={ref_init['n']} (matched torch init), "
        f"identical protocol/steps on the TPU trainer: native-init mean f1 "
        f"{nat['mean_f1']} +/- {nat['se_f1']} (s.e.) vs matched-init {ref_init['mean_f1']} "
        f"+/- {ref_init['se_f1']}; arm difference {arm_delta} +/- {pooled_se} "
        f"(z={z:.2f}). " +
        ("The arms statistically overlap, so the native init matches the transported "
         "torch init in trained-accuracy expectation — combined with the matched-init "
         "parity vs the torch reference itself (delta -0.008 over seeds 0-2), the TPU "
         "pipeline trains to reference accuracy."
         if abs(z) <= 1.0 else
         "The arm difference exceeds one pooled s.e.; the init audit "
         "(util/init.py) remains incomplete — see aggregates.arms for per-arm detail.")
        + f" Reference torch-CPU arm (n={ref['n']}): mean f1 {ref['mean_f1']}."
    )
    prov = d.get('provenance', '')
    d['provenance'] = (prov + ' | round 5: seeds extended via scripts/run_h2h_batch.sh '
                       '(artifacts /tmp/h2h_r5_*) and merged by scripts/update_headtohead.py')

    with open(FN, 'w') as f:
        json.dump(d, f, indent=1)
    print(json.dumps({'native': nat, 'matched': ref_init,
                      'delta': arm_delta, 'pooled_se': pooled_se}, indent=1))


if __name__ == '__main__':
    main()
