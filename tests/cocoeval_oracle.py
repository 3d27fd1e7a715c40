"""Test-only oracle: a faithful transcription of the pycocotools COCOeval
keypoint protocol (iouType='keypoints', one 'person' category).

pycocotools is not installed in this environment, so the production
evaluator (``fhpe_tpu/eval/coco_eval.py``, a condensed from-protocol
implementation) is validated against this independent line-by-line
transcription of the published pycocotools algorithm: computeOks,
evaluateImg's greedy threshold matching (with the id-based gtm/dtm arrays,
crowd rematching, ignore-last early break, and the loadRes keypoint-extent
detection area), accumulate's mergesort score ordering + 101-point
interpolated precision (including the try/except IndexError tail behavior),
and the 10-entry keypoint stats summary.

This mirrors how the reference itself consumes pycocotools
(``/root/reference/lib/dataset/coco.py:444-458``).  Test scaffolding only —
never imported by the production package.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.00, 101)
AREA_RNGS = [(0.0, 1e10), (32 ** 2, 96 ** 2), (96 ** 2, 1e10)]
AREA_LBLS = ["all", "medium", "large"]
MAX_DET = 20


def _load_res_area(keypoints):
    kp = np.asarray(keypoints, dtype=np.float64)
    x = kp[0::3]
    y = kp[1::3]
    x0, x1, y0, y1 = x.min(), x.max(), y.min(), y.max()
    return (x1 - x0) * (y1 - y0)


class KeypointCocoevalOracle:
    """gt_by_img: {img_id: [ann dicts]} with keypoints/bbox/area/iscrowd/
    num_keypoints; img_ids: evaluation image list; sigmas: per-keypoint."""

    def __init__(self, gt_by_img, img_ids, sigmas):
        self.img_ids = list(img_ids)
        self.sigmas = np.asarray(sigmas, dtype=np.float64)
        # _prepare: assign ids (>0) and the keypoint ignore flag
        self._gts = {}
        next_id = 1
        for img_id in self.img_ids:
            anns = []
            for a in gt_by_img.get(img_id, []):
                g = dict(a)
                g["id"] = next_id
                next_id += 1
                ignore = g.get("ignore", 0)
                ignore = "iscrowd" in g and g["iscrowd"]
                g["ignore"] = (g.get("num_keypoints", 0) == 0) or ignore
                anns.append(g)
            self._gts[img_id] = anns

    def _prepare_dts(self, detections):
        dts = {img_id: [] for img_id in self.img_ids}
        next_id = 1
        for det in detections:
            d = dict(det)
            d["id"] = next_id
            next_id += 1
            d["area"] = _load_res_area(d["keypoints"])
            if d["image_id"] in dts:
                dts[d["image_id"]].append(d)
        return dts

    def _compute_oks(self, gts, dts):
        inds = np.argsort([-d["score"] for d in dts], kind="mergesort")
        dts = [dts[i] for i in inds]
        if len(dts) > MAX_DET:
            dts = dts[0:MAX_DET]
        if len(gts) == 0 or len(dts) == 0:
            return []
        ious = np.zeros((len(dts), len(gts)))
        variances = (self.sigmas * 2) ** 2
        k = len(self.sigmas)
        for j, gt in enumerate(gts):
            g = np.array(gt["keypoints"], dtype=np.float64)
            xg, yg, vg = g[0::3], g[1::3], g[2::3]
            k1 = np.count_nonzero(vg > 0)
            bb = gt["bbox"]
            x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
            y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
            for i, dt in enumerate(dts):
                d = np.array(dt["keypoints"], dtype=np.float64)
                xd, yd = d[0::3], d[1::3]
                if k1 > 0:
                    dx, dy = xd - xg, yd - yg
                else:
                    z = np.zeros((k,))
                    dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1), axis=0)
                    dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1), axis=0)
                e = (dx ** 2 + dy ** 2) / variances / (
                    gt["area"] + np.spacing(1)) / 2
                if k1 > 0:
                    e = e[vg > 0]
                ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
        return ious

    def _evaluate_img(self, gt, dt, ious, a_rng, max_det):
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            if g["ignore"] or (g["area"] < a_rng[0] or g["area"] > a_rng[1]):
                g["_ignore"] = 1
            else:
                g["_ignore"] = 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:max_det]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        ious = ious[:, gtind] if len(ious) > 0 else ious

        T, G, D = len(IOU_THRS), len(gt), len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gt_ig = np.array([g["_ignore"] for g in gt])
        dt_ig = np.zeros((T, D))
        if not len(ious) == 0:
            for tind, t in enumerate(IOU_THRS):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dt_ig[tind, dind] = gt_ig[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1]
                      for d in dt]).reshape((1, len(dt)))
        dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0,
                                                    np.repeat(a, T, 0)))
        return {
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gt_ig,
            "dtIgnore": dt_ig,
        }

    def evaluate(self, detections):
        """Returns the 10-entry keypoint stats vector [AP, AP.5, AP.75,
        AP(M), AP(L), AR, AR.5, AR.75, AR(M), AR(L)]."""
        dts = self._prepare_dts(detections)
        ious = {img_id: self._compute_oks(self._gts[img_id], dts[img_id])
                for img_id in self.img_ids}
        eval_imgs = [
            [self._evaluate_img(self._gts[img_id], dts[img_id],
                                np.asarray(ious[img_id]), a_rng, MAX_DET)
             for img_id in self.img_ids]
            for a_rng in AREA_RNGS
        ]

        T, R, A = len(IOU_THRS), len(REC_THRS), len(AREA_RNGS)
        precision = -np.ones((T, R, A))
        recall = -np.ones((T, A))
        for a in range(A):
            E = [e for e in eval_imgs[a] if e is not None]
            if len(E) == 0:
                continue
            dt_scores = np.concatenate(
                [np.asarray(e["dtScores"])[0:MAX_DET] for e in E])
            inds = np.argsort(-dt_scores, kind="mergesort")
            dtm = np.concatenate([e["dtMatches"][:, 0:MAX_DET] for e in E],
                                 axis=1)[:, inds]
            dt_ig = np.concatenate([e["dtIgnore"][:, 0:MAX_DET] for e in E],
                                   axis=1)[:, inds]
            gt_ig = np.concatenate([e["gtIgnore"] for e in E])
            npig = np.count_nonzero(gt_ig == 0)
            if npig == 0:
                continue
            tps = np.logical_and(dtm, np.logical_not(dt_ig))
            fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
            tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
            for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                tp, fp = np.array(tp), np.array(fp)
                nd = len(tp)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                q = np.zeros((R,))
                recall[t, a] = rc[-1] if nd else 0
                pr = pr.tolist()
                q = q.tolist()
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds2 = np.searchsorted(rc, REC_THRS, side="left")
                try:
                    for ri, pi in enumerate(inds2):
                        q[ri] = pr[pi]
                except IndexError:
                    pass
                precision[t, :, a] = np.array(q)

        def _summ(ap, iou_thr=None, area="all"):
            aind = AREA_LBLS.index(area)
            if ap:
                s = precision
                if iou_thr is not None:
                    t = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                    s = s[t]
                s = s[..., aind] if iou_thr is not None else s[:, :, aind]
            else:
                s = recall
                if iou_thr is not None:
                    t = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                    s = s[t]
                s = s[..., aind] if iou_thr is not None else s[:, aind]
            valid = s[s > -1]
            return -1.0 if valid.size == 0 else float(np.mean(valid))

        return [
            _summ(1), _summ(1, 0.5), _summ(1, 0.75),
            _summ(1, area="medium"), _summ(1, area="large"),
            _summ(0), _summ(0, 0.5), _summ(0, 0.75),
            _summ(0, area="medium"), _summ(0, area="large"),
        ]
