import faulthandler, signal, sys
faulthandler.register(signal.SIGUSR1)
faulthandler.dump_traceback_later(240, repeat=True, exit=False)
sys.argv = ["bench.py"]
exec(compile(open("/root/repo/bench.py").read(), "bench.py", "exec"))
