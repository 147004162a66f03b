"""Hang-watchdog tests (sp_gan_tpu/utils/watchdog.py): the failure-detection
subsystem that turns a wedged device dispatch into exit-42 + supervised
restart (the reference's only story is crash-and-rerun,
/root/reference/Generation/model.py:189-195)."""

import time

from sp_gan_tpu.utils import Watchdog


class TestWatchdog:
    def test_fires_when_stale(self):
        fired = []
        dog = Watchdog(0.2, on_timeout=fired.append, poll_s=0.05).start()
        time.sleep(0.6)
        assert dog.fired
        assert len(fired) == 1 and fired[0] > 0.2
        dog.stop()

    def test_beats_keep_it_alive(self):
        fired = []
        dog = Watchdog(0.3, on_timeout=fired.append, poll_s=0.05).start()
        for _ in range(6):
            time.sleep(0.1)
            dog.beat()
        assert not dog.fired and not fired
        dog.stop()
        time.sleep(0.3)
        assert not dog.fired  # stopped clock never fires

    def test_fires_once(self):
        fired = []
        dog = Watchdog(0.1, on_timeout=fired.append, poll_s=0.03).start()
        time.sleep(0.5)
        assert len(fired) == 1  # checker thread exits after firing
        dog.stop()


def test_trainer_completes_with_watchdog(tmp_path):
    # integration: a healthy tiny run under an ample watchdog completes and
    # the dog never fires (the os._exit path would kill pytest itself)
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import SyntheticDataset
    from sp_gan_tpu.train import Trainer

    cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=1, snapshot=1,
                 log_dir=str(tmp_path), donate_state=False,
                 watchdog_secs=120)
    tr = Trainer(cfg, dataset=SyntheticDataset(n_items=8, n_points=32))
    tr.train()
    assert (tmp_path / "ckpt_epoch_1.pkl").exists()
