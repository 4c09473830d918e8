import numpy as np

from s2r_tpu.eval.metrics import Evaluator


def _reference_confusion(gt, pred, num_class):
    # the reference bincount trick (utils/metrics.py:34-39), verbatim math
    mask = (gt >= 0) & (gt < num_class)
    label = num_class * gt[mask].astype(int) + pred[mask]
    count = np.bincount(label, minlength=num_class ** 2)
    return count.reshape(num_class, num_class)


def test_confusion_matches_reference_bincount():
    rng = np.random.RandomState(0)
    gt = rng.randint(0, 19, size=(2, 33, 47))
    gt[rng.rand(*gt.shape) < 0.2] = 255
    pred = rng.randint(0, 19, size=(2, 33, 47))

    ev = Evaluator(19)
    ev.add_batch(gt, pred)
    np.testing.assert_array_equal(ev.confusion_matrix,
                                  _reference_confusion(gt, pred, 19))


def test_metrics_formulas_on_known_matrix():
    # 3 classes, hand-computed
    ev = Evaluator(3)
    gt = np.array([[0, 0, 1, 1, 2, 2]])
    pred = np.array([[0, 1, 1, 1, 2, 0]])
    ev.add_batch(gt, pred)
    # cm: gt0:[1,1,0] gt1:[0,2,0] gt2:[1,0,1]
    assert np.isclose(ev.Pixel_Accuracy(), 4 / 6)
    assert np.isclose(ev.Pixel_Accuracy_Class(), (0.5 + 1.0 + 0.5) / 3)
    miou, iou = ev.Mean_Intersection_over_Union()
    np.testing.assert_allclose(iou, [1 / 3, 2 / 3, 1 / 2])
    assert np.isclose(miou, np.mean([1 / 3, 2 / 3, 1 / 2]))
    fw = ev.Frequency_Weighted_Intersection_over_Union()
    assert np.isclose(fw, (2 / 6) * (1 / 3) + (2 / 6) * (2 / 3) + (2 / 6) * 0.5)


def test_nan_classes_excluded_from_miou():
    ev = Evaluator(19)
    gt = np.zeros((1, 4, 4), int)
    pred = np.zeros((1, 4, 4), int)
    ev.add_batch(gt, pred)
    miou, iou = ev.Mean_Intersection_over_Union()
    assert miou == 1.0  # 18 absent classes are NaN, excluded by nanmean
    assert np.isnan(iou[1:]).all()


def test_accumulation_and_reset():
    rng = np.random.RandomState(1)
    ev = Evaluator(19)
    total = np.zeros((19, 19))
    for _ in range(3):
        gt = rng.randint(0, 19, size=(1, 8, 8))
        pred = rng.randint(0, 19, size=(1, 8, 8))
        ev.add_batch(gt, pred)
        total += _reference_confusion(gt, pred, 19)
    np.testing.assert_array_equal(ev.confusion_matrix, total)
    ev.reset()
    assert ev.confusion_matrix.sum() == 0


def test_add_batch_from_logits():
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 8, 8, 19).astype(np.float32)
    gt = rng.randint(0, 19, size=(2, 8, 8))
    ev = Evaluator(19)
    ev.add_batch_from_logits(logits, gt)
    ev2 = Evaluator(19)
    ev2.add_batch(gt, logits.argmax(-1))
    np.testing.assert_array_equal(ev.confusion_matrix, ev2.confusion_matrix)
