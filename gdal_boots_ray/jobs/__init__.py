"""Cluster job entrypoints (the north_rule's ``ray job submit`` form).

Each module is a ``python -m gdal_boots_ray.jobs.<name>`` CLI that a
driver submits to a running cluster:

    ray job submit --working-dir . -- \
        python -m gdal_boots_ray.jobs.flagship \
        --images s3://bucket/images --out s3://bucket/zonal --resume

The entrypoints own no Ray session policy beyond attaching to the
cluster the job runner provides (``ray.init(address="auto")`` when
RAY_ADDRESS is set by the job server, local otherwise).
"""
