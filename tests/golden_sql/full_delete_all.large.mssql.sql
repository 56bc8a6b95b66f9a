DELETE w FROM resources w WHERE w.baseurl = 'https://api.example.org' AND w.path = '/things';

INSERT INTO resources (href, [key], modified, jsondata, resourcetype, path, baseurl) SELECT href, [key], modified, jsondata, resourcetype, path, baseurl FROM (SELECT href, [key], modified, jsondata, resourcetype, path, baseurl, ROW_NUMBER() OVER (PARTITION BY baseurl, path, href ORDER BY modified DESC) AS rn FROM stg) d WHERE rn = 1;
