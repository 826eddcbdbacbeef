import numpy as np

from u2seg_tpu.evaluation import rle as rle_codec
from u2seg_tpu.pseudo.assembly import (
    assign_cluster_ids,
    gt_panoptic_to_supercategories,
    id2rgb,
    merge_instances_and_stego,
    panoptic_to_semantic,
    rgb2id,
)


def test_id2rgb_roundtrip(rng):
    ids = rng.randint(0, 256 ** 3, (8, 8)).astype(np.int64)
    np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


def make_ann(mask, cat, aid=1, img=1):
    r = rle_codec.encode(mask.astype(np.uint8))
    return {
        "id": aid, "image_id": img, "category_id": cat,
        "segmentation": r, "area": int(mask.sum()), "iscrowd": 0,
    }


def test_assign_cluster_ids():
    src = {
        "images": [{"id": 1}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1},
            {"id": 11, "image_id": 1, "category_id": 1},
        ],
        "categories": [{"id": 1, "name": "fg"}],
    }
    decode = {"1_10": 4}
    out = assign_cluster_ids(src, decode, cluster_num=8)
    assert len(out["annotations"]) == 1
    assert out["annotations"][0]["category_id"] == 5  # cluster 4 -> id 5
    assert len(out["categories"]) == 8 + 27


def test_merge_paste_order_and_overwrite():
    h = w = 20
    big = np.zeros((h, w), bool); big[0:15, 0:15] = True
    small = np.zeros((h, w), bool); small[5:10, 5:10] = True
    hidden = np.zeros((h, w), bool); hidden[6:9, 6:9] = True  # inside small
    anns = [
        make_ann(big, 3, aid=1),
        make_ann(small, 7, aid=2),
        make_ann(hidden, 9, aid=3),
    ]
    # sort by area desc: big, small, hidden -> hidden pasted last wins
    stego = np.zeros((h, w), np.int64)  # label 0 everywhere
    pan, segs = merge_instances_and_stego(anns, stego, cluster_num=10, hw=(h, w))
    cats = {s["category_id"] for s in segs if s["isthing"]}
    assert cats == {3, 7, 9}
    # small instance overwrote part of big; hidden overwrote part of small
    assert pan[7, 7] == [s for s in segs if s["category_id"] == 9][0]["id"]
    assert pan[5, 5] == [s for s in segs if s["category_id"] == 7][0]["id"]
    assert pan[0, 0] == [s for s in segs if s["category_id"] == 3][0]["id"]
    # stuff label 0 fills leftover area with category 10+1+0 = 11
    stuff = [s for s in segs if not s["isthing"]]
    assert len(stuff) == 1 and stuff[0]["category_id"] == 11
    assert pan[19, 19] == stuff[0]["id"]


def test_merge_fully_overwritten_dropped():
    h = w = 10
    under = np.zeros((h, w), bool); under[2:5, 2:5] = True
    over = np.zeros((h, w), bool); over[1:6, 1:6] = True  # bigger, same area order
    anns = [make_ann(over, 1, aid=1), make_ann(under, 2, aid=2)]
    stego = np.zeros((h, w), np.int64)
    pan, segs = merge_instances_and_stego(anns, stego, 5, (h, w))
    # 'under' pasted second (smaller area) covers part of 'over' - both remain
    assert {s["category_id"] for s in segs if s["isthing"]} == {1, 2}
    # now make 'under' fully cover 'over'
    anns = [make_ann(under, 2, aid=2), make_ann(over, 1, aid=1)]
    pan, segs = merge_instances_and_stego(anns, stego, 5, (h, w))
    things = {s["category_id"] for s in segs if s["isthing"]}
    assert things == {1, 2}  # over is bigger -> pasted first, partially visible


def test_merge_stego_overlap_skip():
    h = w = 10
    inst = np.ones((h, w), bool)
    inst[9, :] = False  # covers 90%
    anns = [make_ann(inst, 1)]
    stego = np.zeros((h, w), np.int64)  # one label covering all
    pan, segs = merge_instances_and_stego(anns, stego, 5, (h, w),
                                          overlap_skip=0.7)
    # stego label covered 90% > 70% -> skipped
    assert all(s["isthing"] for s in segs)
    assert (pan[9, :] == 0).all()


def test_panoptic_to_semantic():
    pan = np.zeros((6, 6), np.int64)
    pan[:3] = 1   # thing
    pan[3:5] = 2  # stuff cat 12 (cluster_num 10, label 1)
    segs = [
        {"id": 1, "category_id": 3, "isthing": 1},
        {"id": 2, "category_id": 12, "isthing": 0},
    ]
    sem = panoptic_to_semantic(pan, segs, stuff_base=10)
    assert (sem[:3] == 0).all()
    assert (sem[3:5] == 2).all()
    assert (sem[5] == 255).all()


def test_gt_supercategory_remap():
    pj = {
        "annotations": [{
            "segments_info": [
                {"category_id": 1},     # person (thing) unchanged
                {"category_id": 92},    # banner -> super 1 -> 301
                {"category_id": 187},   # sky -> super 14 -> 314
            ]
        }],
        "categories": [
            {"id": 1, "name": "person", "isthing": 1},
            {"id": 92, "name": "banner", "isthing": 0},
            {"id": 109, "name": "curtain", "isthing": 0},  # also super 1
            {"id": 187, "name": "sky", "isthing": 0},
        ],
    }
    out = gt_panoptic_to_supercategories(pj, cluster_num=300)
    segs = out["annotations"][0]["segments_info"]
    assert [s["category_id"] for s in segs] == [1, 301, 314]
    cat_ids = sorted(c["id"] for c in out["categories"])
    # banner & curtain collapse into one supercategory id 301
    assert cat_ids == [1, 301, 314]
