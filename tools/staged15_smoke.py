import sys, os
sys.path.insert(0, '/root/repo')
os.environ.setdefault("SPARK_GRAFT_CPUS","8")
