"""Logger parity tests: thread-name registry, interleaving banner, and
deadlock-tolerant timed lock (src/logger.cpp:92-142)."""

import threading

from quaff_tpu.logger import Logger


def _make_logger(capsys_off=True):
    lg = Logger()
    lg.use_color = False
    lg.verbosity = 9
    return lg


def test_thread_name_registry():
    lg = _make_logger()
    lg.set_thread_name(1234, "worker #1")
    assert lg.get_thread_name(1234) == "worker #1"
    # unnamed threads fall back to "thread <id>" (logger.cpp:121-129)
    assert lg.get_thread_name(999) == "thread 999"
    t = threading.Thread(target=lambda: None)
    t.start()
    t.join()
    lg.set_thread_name(t.ident, "x")
    lg.erase_thread_name(t)
    assert lg.get_thread_name(t.ident) == f"thread {t.ident}"


def test_name_last_thread():
    lg = _make_logger()
    release = threading.Event()
    threads = []
    for _ in range(2):
        t = threading.Thread(target=release.wait)
        t.start()
        threads.append(t)
        lg.name_last_thread(threads, "align")
    release.set()
    for t in threads:
        t.join()
    assert lg.get_thread_name(threads[0].ident) == "align thread #1"
    assert lg.get_thread_name(threads[1].ident) == "align thread #2"


def test_banner_on_owner_change(capsys):
    lg = _make_logger()
    # single-threaded / no registered names: no banner (threadName.size()>1
    # guard, logger.cpp:95)
    lg.log(1, "plain")
    assert capsys.readouterr().err == "plain\n"
    # two named threads: banner appears when the log owner changes
    lg.set_thread_name(threading.get_ident(), "main")
    done = threading.Event()

    def other():
        lg.set_thread_name(threading.get_ident(), "worker")
        lg.log(1, "from worker")
        done.set()

    t = threading.Thread(target=other)
    t.start()
    done.wait()
    t.join()
    lg.log(1, "from main")
    err = capsys.readouterr().err
    assert "(worker) from worker\n" in err
    assert "(main) from main\n" in err


def test_timed_lock_tolerance(capsys):
    lg = _make_logger()
    lg._lock_timeout = 0.05
    lg.set_thread_name(threading.get_ident(), "main")
    # another thread grabs the lock and sits on it; logging proceeds
    # anyway after the timeout, with a note naming the stuck owner
    grabbed = threading.Event()
    release = threading.Event()

    def holder():
        lg.set_thread_name(threading.get_ident(), "holder")
        lg.log(1, "holder owns the log")  # becomes last owner
        lg._lock.acquire()
        grabbed.set()
        release.wait()
        lg._lock.release()

    t = threading.Thread(target=holder)
    t.start()
    grabbed.wait()
    lg.log(1, "not blocked")
    release.set()
    t.join()
    err = capsys.readouterr().err
    assert "not blocked" in err
    assert "ignoring lock by holder" in err


def test_memsize_probe():
    from quaff_tpu.memsize import get_memory_size

    size = get_memory_size()
    assert size > 1 << 20  # more than 1 MiB of RAM on any real host
