"""Independent reference for quantized k-means (pure numpy, no library
imports). Spec shared with ocr_ray.ops.ann.embedding_kmeans_train:

* vectors quantized to e3 integers via np.rint(v * 1000);
* init centroids = first k qualifying vectors in vec_id order;
* assignment = exact int64 squared L2, ties -> lowest cluster_id;
* update = element-wise FLOOR division of member sums by count (empty
  clusters keep their previous centroid);
* ``iters`` rounds of (assign, update), then one final assignment census;
* inertia_e6 = sum of squared int distances of members (e3 scale squared).
"""

import numpy as np


def ref_kmeans(pts, k, iters):
    x = np.rint(np.asarray(pts, dtype=np.float64) * 1000.0).astype(np.int64)
    cent = x[:k].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)  # argmin takes the FIRST min -> lowest id
        for j in range(len(cent)):
            m = assign == j
            if m.any():
                cent[j] = np.floor_divide(x[m].sum(axis=0), int(m.sum()))
    d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assign = np.argmin(d, axis=1)
    out = {}
    for j in range(len(cent)):
        m = assign == j
        if m.any():
            out[int(j)] = (int(m.sum()), int(d[m, j].sum()))
    return out
