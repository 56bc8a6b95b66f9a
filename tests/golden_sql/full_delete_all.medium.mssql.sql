DELETE w FROM resources w WHERE w.path = '/things';

INSERT INTO resources (href, [key], modified, jsondata, resourcetype, path) SELECT href, [key], modified, jsondata, resourcetype, path FROM (SELECT href, [key], modified, jsondata, resourcetype, path, ROW_NUMBER() OVER (PARTITION BY path, href ORDER BY modified DESC) AS rn FROM stg) d WHERE rn = 1;
